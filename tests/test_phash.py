"""Perceptual-hash image dedup: phash64 kernel properties, the actor
stage's dead-letter contract, and the planted-near-dup recall/precision
oracle for the dedup_phash query."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from glue_etl_pipeline_ray.functions.png import (
    dct2_basis,
    phash64,
    png_decode,
    png_encode,
)

SF_DIR = "/root/testdata/sf0.001"


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_deterministic_and_encode_invariant():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    h1 = phash64(arr)
    assert h1 == phash64(arr)  # pure function
    assert h1 == phash64(png_decode(png_encode(arr)))  # lossless codec
    assert 0 <= h1 < 2**64


def test_phash_near_duplicate_small_hamming_unrelated_large():
    rng = np.random.default_rng(12)
    base = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    near = base.copy()
    for y, x, c in [(3, 4, 0), (10, 15, 2), (1, 19, 1)]:
        near[y, x, c] = np.uint8(min(255, int(near[y, x, c]) + 1))
    other = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    assert _ham(phash64(base), phash64(near)) <= 3
    assert _ham(phash64(base), phash64(other)) > 10


def test_phash_grayscale_and_tiny_images():
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    h = phash64(gray)
    assert 0 <= h < 2**64
    # sub-32 images exercise the clamped box bounds
    tiny = np.random.default_rng(5).integers(0, 256, (3, 4, 3), dtype=np.uint8)
    assert phash64(tiny) == phash64(tiny, dct2_basis(32))


def test_hasher_stage_dead_letters_corrupt_payloads(ray_session):
    import ray as _ray

    from glue_etl_pipeline_ray.functions.multimodal import PngPerceptualHasher

    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 256, (10, 10, 3), dtype=np.uint8) for _ in range(6)
    ]
    payloads = [png_encode(a) for a in imgs]
    payloads[2] = payloads[2][:10]  # truncated
    payloads[4] = b"not a png"
    ds = _ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    out_ds = ds.map_batches(
        PngPerceptualHasher,
        batch_format="pyarrow",
        batch_size=3,
        concurrency=2,
    )
    # stay in Arrow: pandas would demote nullable uint64 to float64 and
    # corrupt the hash's low bits
    tbl = pa.concat_tables(_ray.get(out_ds.to_arrow_refs())).sort_by("doc_id")
    assert tbl.num_rows == 6  # every row lands somewhere — none dropped
    rows = tbl.to_pylist()
    bad = [r for r in rows if r["error"] is not None]
    assert sorted(r["doc_id"] for r in bad) == [2, 4]
    assert all(r["phash"] is None for r in bad)
    basis = dct2_basis(32)
    expected = {i: phash64(imgs[i], basis) for i in (0, 1, 3, 5)}
    got = {r["doc_id"]: r["phash"] for r in rows if r["error"] is None}
    assert got == expected


def _expected_planted_pairs():
    """The synthesized ground truth: (did-1, did) for did%10==1, minus
    pairs with a corrupted member (did%97==0 truncation)."""
    n_docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = set(n_docs["doc_id"].to_pylist())
    pairs = set()
    for did in ids:
        if did % 10 == 1 and (did - 1) in ids:
            if did % 97 == 0 or (did - 1) % 97 == 0:
                continue  # a member dead-letters at decode
            pairs.add((did - 1, did))
    return pairs


def test_dedup_phash_query_planted_recall_and_precision(ray_session):
    from glue_etl_pipeline_ray.pipelines.queries import q_dedup_phash

    got = q_dedup_phash(SF_DIR).to_pandas()
    got_pairs = {
        (min(a, b), max(a, b))
        for a, b in zip(got["doc_id_a"], got["doc_id_b"])
    }
    planted = _expected_planted_pairs()
    assert planted, "fixture must plant at least one pair"
    # recall: every planted near-dup whose members both decode is found
    assert planted <= got_pairs
    # precision: anything extra must still be a verified hamming<=3 pair
    # of genuinely distinct source images — with seeded 24-bit-entropy
    # noise images a false <=3-bit collision is ~impossible, so the
    # found set should be exactly the planted set
    assert got_pairs == planted
    assert (got["hamming"] <= 3).all()


def test_dedup_phash_keep_one_set_oracle(ray_session):
    from glue_etl_pipeline_ray.pipelines.queries import q_dedup_phash_keep_one

    got = q_dedup_phash_keep_one(SF_DIR).to_pandas()
    all_ids = set(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
    )
    # expected: for each planted pair (a, b) that both decode, b (the
    # larger id) is dropped; everything else survives — including the
    # decode dead-letters, which carry error and belong to no cluster
    expect = set(all_ids)
    for a, b in _expected_planted_pairs():
        expect.discard(b)
    assert set(got["doc_id"]) == expect
    dead = got[got["error"].notna()]
    assert len(dead) == sum(1 for d in all_ids if d % 97 == 0)
