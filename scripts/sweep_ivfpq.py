"""IVF-PQ recall/cost parameter sweep (VERDICT r10 item 4).

Replays the q_ann_ivfpq_top10 pipeline math (same Lloyd's fits, same
probe routing, ADC scoring, shortlist + exact refine) in driver-side
numpy over the real embeddings table, across a (K, nprobe, shortlist)
grid — so the recall floor can be tuned from MEASUREMENT, not guessed.
The fit sample here is a seeded uniform draw of the same size as the
pipeline's xxhash64-ordered draw (same distribution; the exact hash
order isn't reproducible outside Spark), so treat recalls as the
pipeline's expected value — the official witness number still comes
from running the registered query.

Cost columns are the two knobs' real 100 TB meanings:
- scan_frac: fraction of corpus rows landing in probed inverted lists
  (the candidate-scoring volume the production form pays);
- shortlist: exact-refine fetches per query (raw-vector reads at scale).

Usage: python scripts/sweep_ivfpq.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from als_pyspark_spark.similarity.queries import (  # noqa: E402
    _IVF_FIT_N,
    _IVF_LLOYD_ITERS,
    _N_QUERIES,
    _PQ_ITERS,
    _PQ_KSUB,
    _PQ_M,
    _PQ_NPROBE,
    _TOP_K,
    _fit_coarse_quantizer,
    _fit_pq_codebooks,
)


def _load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    x = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], x[order]


def sweep(sf_dir: str, grid, top_k: int = _TOP_K):
    ids, x = _load(sf_dir)
    n, dim = x.shape
    norms = np.sqrt((x * x).sum(axis=1, keepdims=True))
    u = np.divide(x, norms, where=norms > 0)

    q_idx = np.where(ids < _N_QUERIES)[0]
    qs = u[q_idx]
    # exact truth: top-k cosine, self excluded, ties toward lower id —
    # identical to the pipeline's (desc cos, asc neighbor_id) window
    cos_all = u @ qs.T  # (n, q)
    truth = []
    for j, qi in enumerate(q_idx):
        c = cos_all[:, j].copy()
        c[qi] = -np.inf
        order = np.lexsort((ids, -c))[:top_k]
        truth.append(set(ids[order]))

    rows = []
    for k, nprobe, shortlist in grid:
        fit_n = min(200 * k, n)
        rng = np.random.RandomState(7)
        sample = u[rng.choice(n, size=fit_n, replace=False)]
        cents = _fit_coarse_quantizer(sample, k, _IVF_LLOYD_ITERS, seed=42)
        books = _fit_pq_codebooks(sample, cents, _PQ_M, _PQ_KSUB, _PQ_ITERS, seed=1042)
        ksub, dsub = books.shape[1], books.shape[2]

        d2 = (
            (u * u).sum(axis=1, keepdims=True)
            - 2.0 * (u @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        cl = d2.argmin(axis=1)
        res = u - cents[cl]
        codes = np.empty((n, _PQ_M), dtype=np.int32)
        for m in range(_PQ_M):
            sub = res[:, m * dsub : (m + 1) * dsub]
            bk = books[m]
            sd2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ bk.T)
                + (bk * bk).sum(axis=1)
            )
            codes[:, m] = sd2.argmin(axis=1)

        sizes = np.bincount(cl, minlength=len(cents))
        recs, fracs = [], []
        for j, qi in enumerate(q_idx):
            qv = qs[j]
            qd2 = ((cents - qv) ** 2).sum(axis=1)
            probed = np.argsort(qd2, kind="stable")[: min(nprobe, len(cents))]
            fracs.append(sizes[probed].sum() / n)
            cand = np.where(np.isin(cl, probed))[0]
            cand = cand[cand != qi]
            lut = np.stack([books[m] @ qv[m * dsub : (m + 1) * dsub] for m in range(_PQ_M)])
            adc = (cents[cl[cand]] * qv).sum(axis=1) + lut[
                np.arange(_PQ_M)[:, None], codes[cand].T
            ].sum(axis=0)
            srt = np.lexsort((ids[cand], -adc))[: min(shortlist, len(cand))]
            short = cand[srt]
            ccos = u[short] @ qv
            fin = np.lexsort((ids[short], -ccos))[:top_k]
            got = set(ids[short[fin]])
            recs.append(len(got & truth[j]) / top_k)
        rows.append(
            dict(
                sf_dir=sf_dir,
                n=n,
                k=k,
                nprobe=nprobe,
                shortlist=shortlist,
                scan_frac=round(float(np.mean(fracs)), 3),
                recall10=round(float(np.mean(recs)), 3),
                per_q=[round(r, 2) for r in recs],
            )
        )
        print(
            f"{sf_dir.split('/')[-1]:>7} n={n:>6} K={k:<3} nprobe={nprobe:<3} "
            f"L={shortlist:<5} scan={rows[-1]['scan_frac']:<6} "
            f"recall@10={rows[-1]['recall10']:<6} per_q={rows[-1]['per_q']}"
        )
    return rows


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    grid = [
        (16, 8, 256),   # shipping config
        (16, 12, 256),
        (16, 8, 1024),   # round-11 shipping
        (16, 12, 1024),  # shipping since round 12 (_PQ_NPROBE)
        (32, 8, 256),
        (32, 12, 256),
        (32, 16, 256),
        (32, 16, 1024),
        (64, 16, 256),
        (64, 24, 256),
        (64, 32, 256),
        (64, 32, 1024),
    ]
    for d in dirs:
        sweep(d, grid)
