"""Golden-matcher quality tests on the deterministic synthetic corpus.

The golden matcher IS our reference-semantics oracle (SURVEY.md §5); these
tests pin its absolute quality on the FIXTURES.md corpus so regressions in
any kernel show up as recall drops.
"""

import collections
import itertools

import pytest

from panako_spark.data import synth
from panako_spark.kernels.codec import to_gray
from panako_spark.kernels.matcher import (
    GoldenMatcher, caption_pairs_golden, connected_components_golden,
    phash_pairs_golden,
)


@pytest.fixture(scope="module")
def corpus():
    rows, truth = synth.generate_corpus(30, dup_fraction=0.5, seed=42)
    groups = collections.defaultdict(list)
    for r in rows:
        groups[r.image_id.split("_dup")[0]].append(r.image_id)
    clique = set()
    for g in groups.values():
        for a, b in itertools.combinations(sorted(g), 2):
            clique.add((a, b))
    return rows, clique, groups


@pytest.fixture(scope="module")
def golden_pairs(corpus, cfg):
    rows, clique, _ = corpus
    gm = GoldenMatcher(cfg)
    for r in rows:
        gm.store_image(r.image_id, to_gray(r.pixels))
    landmark = gm.dedup_pairs()
    caption = caption_pairs_golden({r.image_id: r.caption for r in rows}, cfg)
    caption["phash"] = phash_pairs_golden(
        {r.image_id: r.phash for r in rows}, cfg)
    return landmark, caption


def test_landmark_channel_recall(golden_pairs, corpus):
    landmark, _ = golden_pairs
    _, clique, _ = corpus
    recall = len(landmark & clique) / len(clique)
    assert recall >= 0.5, f"landmark recall {recall}"  # image channel
    # alone; the union test below is the real recall gate


def test_caption_channels_no_false_positives(golden_pairs, corpus):
    _, caption = golden_pairs
    _, clique, _ = corpus
    for ch, pairs in caption.items():
        assert not (pairs - clique), f"{ch} produced false positives"


def test_phash_channel_recall(golden_pairs, corpus):
    _, channels = golden_pairs
    _, clique, _ = corpus
    recall = len(channels["phash"] & clique) / len(clique)
    assert recall >= 0.8, f"phash recall {recall}"


def test_union_recall_is_one(golden_pairs, corpus):
    landmark, caption = golden_pairs
    _, clique, _ = corpus
    allp = set(landmark)
    for p in caption.values():
        allp |= p
    assert clique <= allp, f"missed: {sorted(clique - allp)[:5]}"


def test_negatives_stay_single(golden_pairs, corpus):
    """True negatives (never duplicated) must not appear in caption
    channels (exact semantics); landmark channel FP rate bounded."""
    landmark, caption = golden_pairs
    rows, clique, groups = corpus
    fp = landmark - clique
    assert len(fp) <= len(clique) * 1.2  # bounded texture-collision FPs


def test_connected_components_golden(corpus):
    rows, clique, groups = corpus
    ids = [r.image_id for r in rows]
    labels = connected_components_golden(clique, ids)
    for base, members in groups.items():
        want = min(members)
        for m in members:
            assert labels[m] == labels[want]
    # distinct groups get distinct labels when no cross-group pair exists
    reps = {labels[min(m)] for m in groups.values()}
    assert len(reps) == len(groups)
