"""Medium-scale parity: pipeline vs golden matcher at ~580 images.

The tracer-bullet e2e test (test_pipeline_e2e.py) checks parity at ~45
images; this module re-checks the recall >= 0.99 criterion at 13x that
size, where hash collisions across unrelated images, band-key
collisions, and the hot-hash stop-word rule all actually fire. Module
is self-contained so it can be deselected for quick iterations.
"""

import collections
import itertools

import pytest

from panako_spark.data import synth
from panako_spark.data.synth import rows_to_pandas
from panako_spark.io.checkpoint import CheckpointStore
from panako_spark.kernels.codec import to_gray
from panako_spark.kernels.matcher import (
    GoldenMatcher, caption_pairs_golden, connected_components_golden,
    phash_pairs_golden,
)
from panako_spark.pipeline import run_pipeline

N_BASE = 400


@pytest.fixture(scope="module")
def corpus_m():
    rows, _ = synth.generate_corpus(N_BASE, dup_fraction=0.4, seed=777)
    groups = collections.defaultdict(list)
    for r in rows:
        groups[r.image_id.split("_dup")[0]].append(r.image_id)
    clique = set()
    for g in groups.values():
        for a, b in itertools.combinations(sorted(g), 2):
            clique.add((a, b))
    return rows, clique


@pytest.fixture(scope="module")
def golden_union_m(corpus_m, cfg):
    rows, _ = corpus_m
    gm = GoldenMatcher(cfg)
    for r in rows:
        gm.store_image(r.image_id, to_gray(r.pixels))
    union = set(gm.dedup_pairs())
    caption = caption_pairs_golden({r.image_id: r.caption for r in rows},
                                   cfg)
    caption["phash"] = phash_pairs_golden(
        {r.image_id: r.phash for r in rows}, cfg)
    for p in caption.values():
        union |= p
    return union


@pytest.fixture(scope="module")
def pipeline_pairs_m(corpus_m, cfg, spark, tmp_path_factory):
    rows, _ = corpus_m
    images = spark.createDataFrame(rows_to_pandas(rows))
    store = CheckpointStore(str(tmp_path_factory.mktemp("ckpt_m")))
    res = run_pipeline(spark, images, store, cfg)
    pairs = {(r["id_a"], r["id_b"])
             for r in res.dup_pairs.select("id_a", "id_b").collect()}
    labels = {r["image_id"]: r["cluster_id"]
              for r in res.clusters.collect()}
    return pairs, labels


def test_union_parity_at_scale(pipeline_pairs_m, golden_union_m):
    pairs, _ = pipeline_pairs_m
    golden = golden_union_m
    assert golden, "golden matcher found no dup pairs — corpus broken"
    recall = len(pairs & golden) / len(golden)
    assert recall >= 0.99, (
        f"pipeline recovered {recall:.4f} of {len(golden)} golden pairs")


def test_truth_recall_at_scale(pipeline_pairs_m, corpus_m):
    """Ground-truth quality (not the parity criterion). With the
    log-frequency axis plus the caption MinHash threshold at est>=0.40
    (band-gated; config.py documents the measured FP guard: 0 of ~20k
    random pairs pass), pairwise truth recall on this corpus is 0.972 —
    the residual misses are 80-95% crops whose caption lost >60% of its
    shingles (exact J<=0.38), where neither content nor caption carries
    recoverable signal."""
    pairs, clique = pipeline_pairs_m[0], corpus_m[1]
    recall = len(pairs & clique) / len(clique)
    assert recall >= 0.97, (
        f"ground-truth pair recall {recall:.4f} over {len(clique)}")


def test_truth_cluster_recall_at_scale(pipeline_pairs_m, corpus_m):
    """Every dup should land in its base's cluster (the reference's own
    accuracy contract is query-finds-original, which is cluster-level)."""
    _, labels = pipeline_pairs_m
    rows, _ = corpus_m
    dups = [r.image_id for r in rows if "_dup" in r.image_id]
    ok = sum(1 for d in dups
             if labels[d] == labels[d.split("_dup")[0]])
    recall = ok / len(dups)
    assert recall >= 0.95, f"cluster-level truth recall {recall:.4f}"


def test_cluster_parity_at_scale(pipeline_pairs_m, corpus_m):
    pairs, labels = pipeline_pairs_m
    rows, _ = corpus_m
    golden_labels = connected_components_golden(
        pairs, [r.image_id for r in rows])
    assert labels == golden_labels
