"""Multimodal column plumbing (image/audio/video as opaque binary)."""
