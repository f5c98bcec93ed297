"""KG-construction pipeline stages (the SLING wikiflow analog).

Stage order (SURVEY.md §7): documents → aliases/phrase table → mentions
→ relations → xref clustering → reconcile/merge → materialize.
"""
