"""Co-tenant-window sentinel for scaling measurements.

Round 5 documented a host state in which a fixed-work 1-core CPU burn
that takes ~1.9 s in quiet windows takes 5-9 s, `vmstat` shows 90%+
idle with runnable threads starved, and /proc/stat steal climbs — the
hypervisor freezes vCPUs in multi-second bursts (BENCH/BASELINE.md §2).
A SHORT probe can look clean seconds before the state returns, so a
scaling run must be gated on a SUSTAINED control, not a burst probe
(the 02:15 run-32 launch this round measured a 1.2 s probe and then
hit a fully-throttled window; the legs are archived).

Two modes:

``vet [seconds] [cores]``
    Sustained dual control: repeat [1-core burn, cores-way parallel
    burn] for ``seconds`` wall (default 45 s, 4 cores — the scaling
    pair's fan-out). Prints one JSON line with the best/median wall
    per level, the delivery ratio (1-way / N-way, ~1.0 on healthy
    hardware), steal percentage over the window, and a verdict:
    ``clean`` iff the best 1-core burn is within 1.35x of the 1.9 s
    quiet baseline AND delivery >= 0.9 AND steal < 1%. Gate scaling
    attempts on ``clean``.

``probe [interval_s] [count]``
    Append ``{ts, burn_1core_s, steal_pct, runq}`` to
    BENCH/cpu_probe_r5.jsonl every ``interval_s`` (default 240 s,
    forever) — the same fixed work (40M-iteration burn) and schema as
    the round-5 probe log, so entries are directly comparable to the
    1.83-1.92 s quiet / 4.9-9.5 s throttled history.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUIET_BURN_S = 1.9  # 1-core _burn(40M) in every recorded quiet window

# DRAM floor for a 'clean' verdict. Round-5 session 2026-08-19 found a
# window where a 200 MB numpy copy ran at 1.5 GB/s (rw) while the SAME
# buffer at 1 MB (cache-resident) copied at 56 GB/s and the ALU burn
# was only 1.3x quiet — a co-tenant saturating DRAM bandwidth, which
# the ALU-bound burn control cannot see. In that window the pipeline
# ran 3-4x slower than run-39's legs under near-identical burn
# controls (BENCH/scaling_run41.json analysis in BASELINE.md §2).
# Provisional floor pending quiet-window calibration; the cache/DRAM
# ratio is the window-independent tell (healthy ~3-6x, degraded 30x+).
QUIET_DRAM_FLOOR_GBS = 6.0


def _mem_bw(mb: int = 200, reps: int = 5) -> float:
    """Copy a ``mb``-MB numpy buffer ``reps`` times; GB/s counting both
    read+write traffic. At 200 MB this is DRAM-bound on any cache."""
    import numpy as np

    a = np.zeros(mb * 125_000)
    a.copy()  # warm allocator/faults outside the timed window
    t0 = time.time()
    for _ in range(reps):
        a.copy()
    return round(reps * 2 * a.nbytes / 1e9 / (time.time() - t0), 2)


def _burn(n: int = 40_000_000) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _steal_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(v) for v in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _runq() -> int:
    with open("/proc/loadavg") as fh:
        return int(fh.read().split()[3].split("/")[0])


def _timed_burn() -> float:
    t0 = time.time()
    _burn()
    return round(time.time() - t0, 2)


def _parallel_burn(cores: int) -> float:
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(cores) as p:
        p.map(_burn, [40_000_000] * cores)
    return round(time.time() - t0, 2)


def vet(seconds: float = 45.0, cores: int = 4) -> dict:
    s0, t0j = _steal_jiffies()
    t0 = time.time()
    ones: list[float] = []
    many: list[float] = []
    dram: list[float] = [_mem_bw()]
    cache_gbs = _mem_bw(mb=1, reps=1000)
    while time.time() - t0 < seconds or not many:
        ones.append(_timed_burn())
        many.append(_parallel_burn(cores))
    dram.append(_mem_bw())
    s1, t1j = _steal_jiffies()
    steal_pct = round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2)
    best1, bestn = min(ones), min(many)
    delivery = round(best1 / bestn, 3)
    dram_gbs = max(dram)
    clean = (
        best1 <= QUIET_BURN_S * 1.35
        and delivery >= 0.9
        and steal_pct < 1.0
        and dram_gbs >= QUIET_DRAM_FLOOR_GBS
    )
    out = {
        "mode": "vet",
        "window_s": round(time.time() - t0, 1),
        "cores": cores,
        "burn_1core_s": ones,
        "burn_ncore_s": many,
        "best_1core_s": best1,
        "best_ncore_s": bestn,
        "delivery": delivery,
        "steal_pct": steal_pct,
        "dram_copy_gbs": dram,
        "cache_copy_gbs": cache_gbs,
        "cache_dram_ratio": round(cache_gbs / max(dram_gbs, 0.01), 1),
        "quiet_baseline_s": QUIET_BURN_S,
        "dram_floor_gbs": QUIET_DRAM_FLOOR_GBS,
        "verdict": "clean" if clean else "degraded",
    }
    print(json.dumps(out))
    return out


def probe(interval_s: float = 240.0, count: int = 0) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "cpu_probe_r5.jsonl",
    )
    i = 0
    while count <= 0 or i < count:
        s0, t0j = _steal_jiffies()
        wall = _timed_burn()
        s1, t1j = _steal_jiffies()
        rec = {
            "ts": time.strftime("%H:%M:%S"),
            "burn_1core_s": wall,
            "steal_pct": round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2),
            "runq": _runq(),
            "dram_copy_gbs": _mem_bw(),
        }
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        i += 1
        if count <= 0 or i < count:
            time.sleep(interval_s)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "vet"
    if mode == "vet":
        vet(
            float(sys.argv[2]) if len(sys.argv) > 2 else 45.0,
            int(sys.argv[3]) if len(sys.argv) > 3 else 4,
        )
    elif mode == "probe":
        probe(
            float(sys.argv[2]) if len(sys.argv) > 2 else 240.0,
            int(sys.argv[3]) if len(sys.argv) > 3 else 0,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r} (vet|probe)")
