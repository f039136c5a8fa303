"""Host-side queueing simulation of the block-round serving loop.

Ranks (decode_chunk, admission_bucket, slots) configurations for the
saturated closed-loop workload BEFORE spending real-chip minutes on them
(the tunneled v5e wedges for 20-60 min at a time; expt_sat_grid.py arms
cost ~8 min each).  Costs are the r3 on-chip measurements:

- decode scan: 431 ms at (b=32, chunk=32) -> per-step cost 12.2 ms + 25 ms
  per-round overhead (dispatch + host).  Per-step cost scales mildly with
  live rows b (weight read amortizes): step(b) = 8.4 + 0.12*b ms, matching
  8.9 ms at b32 raw and ~12 ms effective in the 431 ms round.
- block admission marginal (a rows x 512 prompt tokens): measured 283 ms
  at a=8; modeled 60 + 28*a ms (floor = dispatch + first-token tail).

The sim is an idealization (no compile misses, no tunnel jitter, no host
staging), so treat rankings, not absolutes.  Closed loop: a finished slot's
replacement is submitted instantly and boards the next admission wave,
bucket rows max per round.

Run: python scripts/experiments/sim_saturation.py
"""
import itertools

import numpy as np


def step_ms(live_rows: int) -> float:
    return 8.4 + 0.12 * max(live_rows, 1)


def block_ms(a_rows: int) -> float:
    return 60.0 + 28.0 * a_rows


ROUND_OVERHEAD_MS = 25.0
FAMILIES = (1, 2, 3, 4, 6, 8, 10, 12, 16)


def family(n: int, bucket: int) -> int:
    for f in FAMILIES:
        if n <= f <= bucket:
            return f
    return bucket


def simulate(chunk: int, bucket: int, slots: int, *, horizon_s: float = 120.0,
             seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    budgets = np.zeros(slots, np.int64)  # remaining tokens; 0 = free slot
    waiting = slots  # closed loop: queue refills to #slots instantly
    t_ms = 0.0
    emitted = 0
    live_sum = 0.0
    rounds = 0
    ttfts = []
    pending_since = {}  # waiting-request id -> submit time
    next_id = 0
    warm_end = 20e3

    while t_ms < horizon_s * 1e3:
        # admission wave (admit-then-decode): fill free slots, bucket max
        free = np.flatnonzero(budgets == 0)
        n_admit = min(len(free), waiting, bucket)
        a = family(n_admit, bucket) if n_admit else 0
        round_ms = ROUND_OVERHEAD_MS
        if n_admit:
            round_ms += block_ms(a)
            for s in free[:n_admit]:
                budgets[s] = rng.integers(80, 177)
                rid = next_id
                next_id += 1
                sub = pending_since.pop(rid, t_ms)
                if t_ms > warm_end:
                    ttfts.append(t_ms + round_ms - sub)
            waiting -= n_admit
        live = int((budgets > 0).sum())
        # decode scan: each live row advances up to `chunk` steps
        adv = np.minimum(budgets[budgets > 0], chunk)
        emitted_this = int(adv.sum())
        round_ms += step_ms(live) * chunk
        done = int((budgets[budgets > 0] <= chunk).sum())
        budgets[budgets > 0] = np.maximum(budgets[budgets > 0] - chunk, 0)
        # closed loop: completions immediately resubmit
        for _ in range(done):
            pending_since[next_id + len(pending_since)] = t_ms + round_ms
        waiting += done
        t_ms += round_ms
        if t_ms > warm_end:
            emitted += emitted_this
            live_sum += live
            rounds += 1

    window_s = (t_ms - warm_end) / 1e3
    return {
        "chunk": chunk, "bucket": bucket, "slots": slots,
        "agg_tps": round(emitted / window_s, 1),
        "mean_live": round(live_sum / max(rounds, 1), 1),
        "ttft_p50_ms": round(float(np.median(ttfts)), 0) if ttfts else None,
        "round_ms": round(t_ms / max(rounds, 1), 0),
    }


def main():
    print(f"{'chunk':>5} {'bucket':>6} {'slots':>5} {'tok/s':>7} "
          f"{'live':>6} {'ttft p50':>8}")
    for chunk, bucket, slots in itertools.product(
            (8, 16, 24, 32, 48), (4, 8, 12, 16), (32, 48)):
        if bucket > slots:
            continue
        r = simulate(chunk, bucket, slots)
        print(f"{r['chunk']:>5} {r['bucket']:>6} {r['slots']:>5} "
              f"{r['agg_tps']:>7} {r['mean_live']:>6} "
              f"{r['ttft_p50_ms']:>8}")


if __name__ == "__main__":
    main()
