"""Gate a big real-chip run: health probe + HBM canary, in THIS process.

Two failure modes the tunnel exhibits between back-to-back big runs
(CLAUDE.md "Environment gotchas"):
  1. DEGRADED/WEDGED chip — a jit'd 50-matmul loop takes >2 s (or hangs).
  2. STALE HBM — the tunnel retains a dead client's buffers for minutes
     after a clean exit; the next big engine passes init and then hits
     RESOURCE_EXHAUSTED on every executable.  The canary allocates
     GATE_GB (default 13) in 1 GiB chunks and fetches one element of
     each — allocation alone is lazy and does NOT prove the memory is
     usable.

Run it as a SUBPROCESS gate before each big run (exit 0 = go):

    timeout 1200 python scripts/chip_gate.py && python bench.py ...

Env: GATE_GB (default 13), GATE_WAIT_S total wait budget (default 900),
GATE_PROBE_S healthy-loop threshold (default 2.0), GATE_ATTEMPT_S
per-attempt subprocess timeout (default 300 — a WEDGED chip hangs the
probe's block_until_ready forever; only a subprocess boundary recovers).
"""
import os
import subprocess
import sys
import time

# Repo root == parent of scripts/ (ADVICE r4: don't hardcode /root/repo).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def probe_once(threshold_s: float) -> bool:
    """Reuse bench.py's calibrated probe (ADVICE r4: a second, divergent
    probe workload would drift from the threshold calibrated against
    bench.py's 2048x2048 fori_loop — ~40 ms healthy vs ~7 s degraded).
    probe_inproc compiles + warms with a real data fetch outside its timed
    window (block_until_ready is a weak sync on the axon tunnel)."""
    if threshold_s == float("inf"):  # CPU smoke: 50 2048^3 matmuls on the
        print("probe: skipped (threshold inf)", flush=True)
        return True  # single-core host would take minutes
    import bench

    dt = bench.probe_inproc("gate")
    return dt < threshold_s


def canary_once(gb: int) -> bool:
    """Allocate `gb` GiB in 1 GiB chunks and touch each; free on return."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    chunk = (1024, 1024, 512)  # 1 GiB of bf16
    bufs = []
    try:
        for i in range(gb):
            b = jnp.full(chunk, float(i), jnp.bfloat16)
            float(np.asarray(b[0, 0, 0]))  # force materialization
            bufs.append(b)
        print(f"canary: {gb} GiB allocated+touched", flush=True)
        return True
    except Exception as e:  # RESOURCE_EXHAUSTED or tunnel error
        print(f"canary: failed at {len(bufs)} GiB: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        return False
    finally:
        del bufs


def attempt() -> int:
    """One probe+canary pass in THIS process (called with --once)."""
    from chatts_tpu.utils import compile_cache

    cpu_smoke = os.environ.get("GATE_CPU") == "1"  # smoke-test off-chip
    if cpu_smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()
    # CPU smoke mode (ADVICE r4): the chip-calibrated defaults would OOM the
    # host (13 GiB touch) and spuriously fail the probe threshold (bf16
    # matmuls on the single-core host).  Default down/off unless overridden.
    gb = int(os.environ.get("GATE_GB", "1" if cpu_smoke else "13"))
    thr = float(os.environ.get("GATE_PROBE_S",
                               "inf" if cpu_smoke else "2.0"))
    try:
        ok = probe_once(thr) and canary_once(gb)
    except Exception as e:
        print(f"gate attempt: {type(e).__name__}: {str(e)[:160]}", flush=True)
        ok = False
    return 0 if ok else 1


def main() -> int:
    wait_s = float(os.environ.get("GATE_WAIT_S", "900"))
    attempt_s = float(os.environ.get("GATE_ATTEMPT_S", "300"))
    deadline = time.time() + wait_s
    n = 0
    while True:
        n += 1
        t0 = time.time()
        try:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), "--once"],
                timeout=attempt_s)
        except subprocess.TimeoutExpired:
            print(f"gate attempt {n}: HUNG past {attempt_s:.0f}s "
                  "(wedged chip?) — child killed", flush=True)
            rc = 1
        if rc == 0:
            print("gate: GO", flush=True)
            return 0
        if time.time() > deadline:
            print("gate: NO-GO (budget exhausted)", flush=True)
            return 1
        time.sleep(max(5.0, 45.0 - (time.time() - t0)))


if __name__ == "__main__":
    sys.exit(attempt() if "--once" in sys.argv else main())
