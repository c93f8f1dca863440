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
        gm.store_image(r.image_id, to_gray(r.pixels), phash=r.phash)
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


# ------------------------------------------------------------ E8 / Olaf ----
def test_olaf_hash_bit_layout():
    """Pin the rigid-hash field layout (OlafFingerprint.java:154-196):
    one hand-computed vector per field group."""
    import numpy as np

    from panako_spark.kernels.landmarks import pack_hashes_olaf

    a = lambda v: np.array([v])
    h = pack_hashes_olaf(a(10), a(40), a(1.0),
                         a(15), a(30), a(3.0),
                         a(22), a(50), a(2.0))[0]
    # diffT = 22-10 = 12
    assert h & 0x3F == 12
    # f1>f2 (40>30)=1, f2>f3 (30>50)=0, f3>f1 (50>40)=1
    assert (h >> 6) & 1 == 1 and (h >> 7) & 1 == 0 and (h >> 8) & 1 == 1
    # m1>m2 (1>3)=0, m2>m3 (3>2)=1, m3>m1 (2>1)=1
    assert (h >> 9) & 1 == 0 and (h >> 10) & 1 == 1 and (h >> 11) & 1 == 1
    # (t2-t1)=5 > (t3-t2)=7 -> 0 ; |f2-f1|=10 > |f3-f2|=20 -> 0
    assert (h >> 12) & 1 == 0 and (h >> 13) & 1 == 0
    # f1>>1 = 20 ; |f2-f1|>>2 = 2 ; |f3-f2|>>2 = 5
    assert (h >> 14) & 0xFF == 20
    assert (h >> 22) & 0x3F == 2
    assert (h >> 28) & 0x3F == 5
    assert h >> 34 == 0  # nothing above bit 34


def test_olaf_strategy_prints_differ_and_2point_mode(cfg):
    """strategy='olaf' changes the hash stream (rigid layout) and the
    2-point mode emits pair fingerprints (e1, e2, e2)."""
    import numpy as np

    from panako_spark.data import synth
    from panako_spark.kernels.codec import to_gray
    from panako_spark.kernels.landmarks import extract_prints

    rows, _ = synth.generate_corpus(2, dup_fraction=0.0, seed=5)
    gray = to_gray(rows[0].pixels)
    h_p, t_p, f_p = extract_prints(gray, cfg)
    h_o, t_o, f_o = extract_prints(gray, cfg.with_(strategy="olaf"))
    h_o2, _, _ = extract_prints(
        gray, cfg.with_(strategy="olaf", olaf_eps_per_fp=2))
    assert h_p.size and h_o.size and h_o2.size
    assert set(h_p.tolist()) != set(h_o.tolist())
    # both layouts are 34-bit; 2-point mode degenerates the p3 fields
    assert h_o.max() < (1 << 34) and h_o2.max() < (1 << 34)
    assert set(h_o2.tolist()) != set(h_o.tolist())


def test_olaf_golden_self_match(cfg):
    """Golden lifecycle parity under strategy='olaf': an identical copy
    and a noisy copy of an image match; a different image does not."""
    from panako_spark.data import synth
    from panako_spark.kernels.codec import to_gray
    from panako_spark.kernels.matcher import GoldenMatcher

    rows, _ = synth.generate_corpus(6, dup_fraction=0.5, seed=11)
    ocfg = cfg.with_(strategy="olaf")
    gm = GoldenMatcher(ocfg)
    for r in rows:
        gm.store_image(r.image_id, to_gray(r.pixels), phash=r.phash)
    pairs = gm.dedup_pairs()
    import itertools, collections
    groups = collections.defaultdict(list)
    for r in rows:
        groups[r.image_id.split("_dup")[0]].append(r.image_id)
    truth = set()
    rigid_truth = set()
    # the rigid hash is NOT crop/rescale-invariant by design — grade it
    # only on the geometric-identity modifications it exists for
    rigid_mods = ("reencode", "gamma", "noise", "translate")
    for g in groups.values():
        for a, b in itertools.combinations(sorted(g), 2):
            truth.add((a, b))
            mods = [x for x in (a, b) if "_dup" in x]
            if all(any(m in x for m in rigid_mods) for x in mods):
                rigid_truth.add((a, b))
    assert rigid_truth, "corpus must contain rigid-compatible dups"
    found = len(pairs & rigid_truth) / len(rigid_truth)
    assert found >= 0.99, (pairs, rigid_truth)
    # and no pair outside the truth cliques (precision 1.0)
    assert not (pairs - truth), pairs - truth
