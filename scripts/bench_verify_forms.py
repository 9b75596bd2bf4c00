"""A/B the KMV verification kernel's physical forms under concurrency.

Motivation (BENCH/BASELINE.md): the batch-flat kernel measured 3.6x
faster than the per-pair loop single-threaded (27.5 -> 7.7 us/pair), but
the full pipeline's verify stage is FLAT from local[4] to local[16]
(169.9s vs 170.6s at 1.11M docs) and 2.9x SLOWER than round-1's loop
kernel at local[16] (59.5s). Hypothesis: the flat form streams ~40 MB of
int64 temporaries per 10k-pair batch (keys, mergesort in+out, masks) —
16 workers saturate DRAM bandwidth, while the loop form's per-pair
working set (2 x 64 int32) is L1-resident and scales with cores.

This harness measures us/pair for three forms x {1, 16} pinned worker
processes on identical synthetic batches (k=64, hashes in [0, 2^31),
sorted-distinct, packed <i4 — the production layout):

* loop    — round-1 per-pair np.intersect1d/union1d loop
* flat    — the committed whole-batch pair-tagged form
* chunk-C — the flat form over C-pair slices (cache-resident candidate)

Usage:
  python scripts/bench_verify_forms.py            # parent: all forms x {1,16}
  (workers are spawned with MALLOC_MMAP_THRESHOLD_/TRIM=1g, one CPU each)
"""

import json
import os
import subprocess
import sys
import time

N_PAIRS = 10_000   # one Arrow-sized batch
N_BATCH = 10       # batches per rep
K = 64
SEED = 0x5EED


def make_batch(rng, n):
    """(list[bytes] a, list[bytes] b) — packed sorted-distinct bottom-64."""
    import numpy as np

    def side():
        vals = rng.integers(0, 1 << 31, size=(n, K * 2), dtype=np.int64)
        out = []
        for r in vals:
            u = np.unique(r)[:K].astype("<i4")
            out.append(u.tobytes())
        return out

    return side(), side()


def form_loop(set_a, set_b, n, sketch_k=K):
    import numpy as np

    inter = np.empty(n, dtype=np.int64)
    un = np.empty(n, dtype=np.int64)
    for i in range(n):
        a = np.frombuffer(set_a[i], dtype="<i4")
        b = np.frombuffer(set_b[i], dtype="<i4")
        ab = np.intersect1d(a, b, assume_unique=True)
        u = np.union1d(a, b)[:sketch_k]
        hi = u[-1] if u.size else 0
        inter[i] = int(np.searchsorted(ab, hi, side="right"))
        un[i] = u.size
    return inter, un


def _flat_cells(values, lo, hi):
    import numpy as np

    lens = np.fromiter((len(x) >> 2 for x in values[lo:hi]), np.int64, hi - lo)
    flat = np.frombuffer(b"".join(values[lo:hi]), dtype="<i4").astype(np.int64)
    return flat, lens


def form_flat(set_a, set_b, n, sketch_k=K, lo=0, hi=None, out=None):
    """The committed batch-flat form, optionally over a [lo, hi) slice."""
    import numpy as np

    if hi is None:
        hi = n
    m = hi - lo
    va, la = _flat_cells(set_a, lo, hi)
    vb, lb = _flat_cells(set_b, lo, hi)
    ia = np.repeat(np.arange(m, dtype=np.int64), la)
    ib = np.repeat(np.arange(m, dtype=np.int64), lb)
    ka = ia * (1 << 31) + va
    kb = ib * (1 << 31) + vb
    if kb.size:
        pos = np.searchsorted(kb, ka)
        hit = pos < kb.size
        hit[hit] = kb[pos[hit]] == ka[hit]
    else:
        hit = np.zeros(ka.size, dtype=bool)
    allk = np.sort(np.concatenate([ka, kb]), kind="mergesort")
    if allk.size:
        first = np.empty(allk.size, dtype=bool)
        first[0] = True
        np.not_equal(allk[1:], allk[:-1], out=first[1:])
        uk = allk[first]
    else:
        uk = allk
    upair = uk >> 31
    seg_len = np.bincount(upair, minlength=m)
    un = np.minimum(seg_len, sketch_k)
    seg_start = np.concatenate(([0], np.cumsum(seg_len)[:-1]))
    hi_idx = seg_start + np.maximum(un, 1) - 1
    hi_key = (
        uk[np.minimum(hi_idx, max(uk.size - 1, 0))]
        if uk.size
        else np.zeros(m, dtype=np.int64)
    )
    km, pm = ka[hit], ia[hit]
    inter = np.bincount(pm[km <= hi_key[pm]], minlength=m).astype(np.int64)
    if out is not None:
        out[0][lo:hi] = inter
        out[1][lo:hi] = un
        return out
    return inter, un


def form_chunk(set_a, set_b, n, chunk, sketch_k=K):
    import numpy as np

    inter = np.empty(n, dtype=np.int64)
    un = np.empty(n, dtype=np.int64)
    for lo in range(0, n, chunk):
        form_flat(set_a, set_b, n, sketch_k, lo, min(lo + chunk, n), (inter, un))
    return inter, un


def run_worker(form):
    import numpy as np

    cpu = int(os.environ.get("WORKER_CPU", "0"))
    os.sched_setaffinity(0, {cpu})
    rng = np.random.default_rng(SEED + cpu)
    batches = [make_batch(rng, N_PAIRS) for _ in range(N_BATCH)]

    def one_pass():
        for a, b in batches:
            if form == "loop":
                form_loop(a, b, N_PAIRS)
            elif form == "flat":
                form_flat(a, b, N_PAIRS)
            elif form.startswith("chunk"):
                form_chunk(a, b, N_PAIRS, int(form[5:]))
            else:
                raise SystemExit(f"unknown form {form}")

    one_pass()  # warm the heap (page-fault tax, see CLAUDE.md)
    t0 = time.perf_counter()
    one_pass()
    dt = time.perf_counter() - t0
    print(json.dumps({"cpu": cpu, "sec": dt, "pairs": N_PAIRS * N_BATCH}))


def run_parent():
    env_base = dict(
        os.environ,
        MALLOC_MMAP_THRESHOLD_="1073741824",
        MALLOC_TRIM_THRESHOLD_="1073741824",
    )
    forms = ["loop", "flat", "chunk512", "chunk1024", "chunk2048", "chunk4096"]
    results = {}
    for nproc in (1, 16):
        for form in forms:
            procs = []
            t0 = time.perf_counter()
            for w in range(nproc):
                env = dict(env_base, WORKER_CPU=str(w * 2 if nproc <= 16 else w))
                procs.append(
                    subprocess.Popen(
                        [sys.executable, __file__, "--worker", form],
                        env=env,
                        stdout=subprocess.PIPE,
                    )
                )
            total_pairs = 0
            worker_secs = []
            for p in procs:
                out, _ = p.communicate()
                rec = json.loads(out)
                total_pairs += rec["pairs"]
                worker_secs.append(rec["sec"])
            wall = time.perf_counter() - t0
            us_pair = max(worker_secs) * 1e6 / (N_PAIRS * N_BATCH)
            results[f"{form}@{nproc}"] = round(us_pair, 2)
            print(
                f"{form:10s} x{nproc:2d}: {us_pair:8.2f} us/pair "
                f"(slowest worker; wall {wall:.1f}s incl. setup)",
                file=sys.stderr,
            )
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(sys.argv[2])
    else:
        run_parent()
