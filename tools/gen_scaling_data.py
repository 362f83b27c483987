"""Deterministic local generator for SCALING-CURVE testdata.

The driver ships sf0.001/0.01/0.1 (read-only); every 100 TB claim in
this repo was argued from plans, not measured growth (VERDICT r7 #2).
This module extends the SF axis locally — sf0.03/0.1/0.3/1 under
``<repo>/.scaling/`` (gitignored) — with tables that match the driver
data's MARGINALS, so slopes measured across the generated family are
about the ENGINE, not a distribution break:

* ``documents``: the driver's exact 31-word vocabulary (read from the
  sf0.1 table), uniform 10-100 words/doc, same lang/source mix, plus
  planted duplicate structure at CONSTANT RATES (1 % exact copies,
  2 % light near-dups ≈ Jaccard 0.9, 2 % medium near-dups ≈ 0.55) so
  candidate-pair counts have a well-defined expected growth.
* ``embeddings``: unit-norm 64-dim vectors sampled from per-label
  Gaussians whose mean/residual-scale are FIT from the driver sf0.1
  table — the frozen IVF codebook (trained on driver sf0.01) routes
  the generated vectors exactly like real ones. 2 % planted twins at
  cosine ≥ 0.99.
* ``events``: same layout (5 uniform event types, '{"k": N}' props,
  exp(mean 50) values, 30-day span, 15 000 users/sf).

Generation is pure numpy + pyarrow (no Spark) and seeded per
(table, sf): the same call always writes byte-identical tables.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DRIVER_SF01 = "/root/testdata/sf0.1"
#: rows per unit SF, matching the driver's ratios (sf0.1 = 5000 docs,
#: 2000 embeddings, 100k events)
DOCS_PER_SF = 50_000
EMB_PER_SF = 20_000
EVENTS_PER_SF = 1_000_000
USERS_PER_SF = 15_000

EXACT_DUP_RATE = 0.01
NEAR_DUP_LIGHT_RATE = 0.02  # ~1 word swapped → Jaccard ≈ 0.9
NEAR_DUP_MED_RATE = 0.02  # ~10 % words swapped → Jaccard ≈ 0.5-0.6
TWIN_RATE = 0.02  # embedding twins at cosine ≥ 0.99

_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _driver_vocab() -> list[str]:
    tbl = pq.read_table(f"{DRIVER_SF01}/documents.parquet", columns=["text"])
    words: set[str] = set()
    for t in tbl.column("text").to_pylist():
        words.update(t.split(" "))
    return sorted(words)


def _driver_label_stats() -> tuple[np.ndarray, np.ndarray]:
    """(means[10, 64], residual_scale[10]) fit from the driver sf0.1
    embeddings — per-label mean vector and mean residual norm."""
    tbl = pq.read_table(f"{DRIVER_SF01}/embeddings.parquet")
    labels = np.asarray(tbl.column("label").to_pylist())
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    n_labels = int(labels.max()) + 1
    means = np.zeros((n_labels, vecs.shape[1]))
    scales = np.zeros(n_labels)
    for lbl in range(n_labels):
        m = vecs[labels == lbl]
        means[lbl] = m.mean(axis=0)
        scales[lbl] = float(np.linalg.norm(m - means[lbl], axis=1).mean())
    return means, scales


def gen_documents(n: int, seed: int, vocab: list[str]) -> pa.Table:
    rng = np.random.default_rng(seed)
    V = len(vocab)
    texts: list[str] = []
    docs_words: list[np.ndarray] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < EXACT_DUP_RATE:
            w = docs_words[int(rng.integers(0, i))].copy()
        elif i > 10 and r < EXACT_DUP_RATE + NEAR_DUP_LIGHT_RATE:
            w = docs_words[int(rng.integers(0, i))].copy()
            k = max(1, len(w) // 50)  # ~2 % of words
            pos = rng.integers(0, len(w), size=k)
            w[pos] = rng.integers(0, V, size=k)
        elif i > 10 and r < EXACT_DUP_RATE + NEAR_DUP_LIGHT_RATE + NEAR_DUP_MED_RATE:
            w = docs_words[int(rng.integers(0, i))].copy()
            k = max(2, len(w) // 10)  # ~10 % of words
            pos = rng.integers(0, len(w), size=k)
            w[pos] = rng.integers(0, V, size=k)
        else:
            w = rng.integers(0, V, size=int(rng.integers(10, 101)))
        docs_words.append(w)
        texts.append(" ".join(vocab[j] for j in w))
    langs = rng.choice(_LANGS, size=n, p=_LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([str(x) for x in langs], pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(
    n: int, seed: int, means: np.ndarray, scales: np.ndarray
) -> tuple[pa.Table, pa.Table]:
    """Returns (embeddings table, planted-twin ground-truth table).
    The twin table (``i`` < ``j`` vec_id pairs at cosine ≥ ~0.99) is
    written as ``_twins.parquet`` — underscore-prefixed so Spark's file
    listing never picks it up as data; the scaling harness reads it
    directly for recall measurement."""
    rng = np.random.default_rng(seed)
    n_labels, dim = means.shape
    labels = rng.integers(0, n_labels, size=n)
    noise = rng.standard_normal((n, dim))
    vecs = means[labels] + noise * (scales[labels] / np.sqrt(dim))[:, None]
    # planted twins: ~TWIN_RATE of rows become a barely-perturbed copy
    # of the previous row (cosine ≥ 0.99 → found by every near-dup path)
    twin_mask = (rng.random(n) < TWIN_RATE) & (np.arange(n) > 0)
    idx = np.where(twin_mask)[0]
    # drop CONSECUTIVE twin indices: the vectorized assignment below
    # reads the PRE-assignment row idx-1, so if idx-1 is itself being
    # replaced, the recorded (idx-1, idx) pair would NOT be at cosine
    # ≥ 0.99 — silently deflating measured recall by ~TWIN_RATE² of
    # twins (round-9 ADVICE fix)
    idx = idx[np.diff(np.r_[-2, idx]) > 1]
    vecs[idx] = vecs[idx - 1] + rng.standard_normal((len(idx), dim)) * 0.01
    labels[idx] = labels[idx - 1]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row for row in vecs.astype(np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    twins = pa.table(
        {
            "i": pa.array((idx - 1).astype(np.int64), pa.int64()),
            "j": pa.array(idx.astype(np.int64), pa.int64()),
        }
    )
    return emb, twins


def gen_events(n: int, seed: int, n_users: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 86_400 * 1_000_000
    ts = np.sort(t0 + rng.integers(0, span, size=n))
    types = rng.choice(
        ["view", "click", "purchase", "signup", "error"], size=n
    )
    ks = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, max(1, n_users), size=n), pa.int64()
            ),
            "event_type": pa.array([str(x) for x in types], pa.string()),
            "value": pa.array(
                np.round(rng.exponential(50.0, size=n), 2), pa.float64()
            ),
            "props": pa.array([f'{{"k": {int(k)}}}' for k in ks], pa.string()),
        }
    )


#: bump on any change to the generated DISTRIBUTION (twin structure,
#: rates, marginals) — cached .scaling dirs from an older generator are
#: wiped and rebuilt instead of silently mixing generations
GEN_VERSION = 2  # v2: consecutive-twin exclusion (round-9 ADVICE fix)


def generate(out_dir: str, sf: float, seed: int = 42) -> dict:
    """Write documents/embeddings/events for ``sf`` into ``out_dir``
    (idempotent: skips tables that already exist and match
    ``GEN_VERSION``). Returns row counts."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "GENERATED.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            meta = json.load(fh)
        if meta.get("gen_version") != GEN_VERSION:
            import shutil

            shutil.rmtree(out_dir)
            os.makedirs(out_dir)
    counts = {}
    vocab = means = scales = None
    plan = {
        "documents": int(DOCS_PER_SF * sf),
        "embeddings": int(EMB_PER_SF * sf),
        "events": int(EVENTS_PER_SF * sf),
    }
    for table, n in plan.items():
        path = os.path.join(out_dir, f"{table}.parquet")
        counts[table] = n
        if os.path.exists(path):
            continue
        # stable across processes (str hash is PYTHONHASHSEED-randomized)
        import zlib

        tseed = seed * 1_000_003 + zlib.crc32(f"{table}|{sf:.6f}".encode())
        if table == "documents":
            vocab = vocab or _driver_vocab()
            tbl = gen_documents(n, tseed, vocab)
        elif table == "embeddings":
            if means is None:
                means, scales = _driver_label_stats()
            tbl, twins = gen_embeddings(n, tseed, means, scales)
            pq.write_table(twins, os.path.join(out_dir, "_twins.parquet"))
        else:
            tbl = gen_events(n, tseed, max(10, int(USERS_PER_SF * sf)))
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    with open(marker, "w") as fh:
        json.dump(
            {"sf": sf, "seed": seed, "rows": counts, "gen_version": GEN_VERSION},
            fh,
        )
    return counts


def uniform_docs(spark, n: int, tokens: int = 24):
    """A structure-free document table: ``n`` docs of ``tokens``
    md5-derived tokens each, no shared vocabulary between documents —
    so simhash fingerprints are ~uniform and ALL band collisions are
    the random term. This is the corpus the N-aware banding's
    uniform-model bound speaks about; the planted scaling corpus
    deliberately carries near-dup clusters whose pair count (the
    ANSWER) is itself superlinear, which would drown the random term
    any gate tries to measure."""
    from pyspark.sql import functions as F

    toks = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{i}")))
        for i in range(tokens)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling"
    ))
    ap.add_argument("--sfs", default="0.03,0.1,0.3,1,3")
    args = ap.parse_args()
    for sf_s in args.sfs.split(","):
        sf = float(sf_s)
        out = os.path.join(args.root, f"sf{sf_s}")
        counts = generate(out, sf)
        print(f"sf{sf_s}: {counts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
