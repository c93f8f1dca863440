"""Generate the inline-oracle fixture for the 4 queries whose inputs are
deterministic synthetic corpora rather than testdata tables (VERDICT r4
#5: 'give the no_oracle rows an oracle').

For each query the expected rowset is computed by the PURE-PYTHON golden
twin — the single-node matcher / NumPy recompute, never the Spark code
under test — then cross-checked bit-exact against a live Spark run of
the queries() entry before being written to
tests/golden/inline_oracles.json. oracle_sql() renders that JSON as a
DuckDB `VALUES` literal, so the driver's hash compare now gates these
queries exactly like the table-backed ones.

Regenerate (and re-verify) with: python tools/gen_inline_oracles.py
The tool REFUSES to write if golden and Spark disagree.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tests", "golden", "inline_oracles.json")

import numpy as np


def golden_image_dedup_pipeline() -> tuple[list[str], list[list]]:
    """(id_a, id_b, channel) rows from the golden per-channel matchers —
    the same corpus and config the queries() entry builds."""
    from panako_spark.config import PanakoConfig
    from panako_spark.data.synth import generate_corpus
    from panako_spark.kernels.codec import to_gray
    from panako_spark.kernels.matcher import (
        GoldenMatcher, caption_pairs_golden, phash_pairs_golden,
    )

    cfg = PanakoConfig()
    rows, _ = generate_corpus(10, dup_fraction=0.5, seed=7)
    gm = GoldenMatcher(cfg)
    grays = {r.image_id: to_gray(r.pixels) for r in rows}
    for r in rows:
        gm.store_image(r.image_id, grays[r.image_id], phash=r.phash)
    by_channel: dict[str, set] = {"landmark": set(gm.dedup_pairs())}
    by_channel.update(caption_pairs_golden(
        {r.image_id: r.caption for r in rows}, cfg))
    by_channel["phash"] = phash_pairs_golden(
        {r.image_id: r.phash for r in rows}, cfg)
    by_channel["tile"] = gm.tile_rescue_pairs(grays)
    out = [[a, b, ch] for ch, pairs in by_channel.items()
           for a, b in sorted(pairs)]
    return ["id_a", "id_b", "channel"], out


def golden_multimodal_image_features() -> tuple[list[str], list[list]]:
    from panako_spark.data.synth import generate_corpus
    from panako_spark.kernels.codec import to_gray
    from panako_spark.operators.multimodal import _resize

    rows, _ = generate_corpus(8, dup_fraction=0.25, seed=11)
    out = []
    for r in rows:
        small = _resize(r.pixels, 32, 32)  # PNG roundtrip is lossless
        g = to_gray(small)
        gy, gx = np.gradient(g)
        mag = np.hypot(gx, gy)
        out.append([r.image_id, float(g.std()), float((mag > 10.0).mean())])
    return ["image_id", "std_gray", "edge_density"], out


def golden_multimodal_audio_features() -> tuple[list[str], list[list]]:
    # mirror of the queries() entry's corpus and of audio_features'
    # exact float32 op sequence (bit-identity is the contract)
    sr = 8000
    out = []
    for i in range(6):
        t = np.arange(sr // 2, dtype=np.float64) / sr
        wave64 = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        pcm = (wave64 * 32767).astype("<i2").tobytes()
        wave = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
        out.append([f"a{i}",
                    float(wave.size / sr),
                    float(np.sqrt(np.mean(wave ** 2))),
                    int(np.count_nonzero(np.diff(np.signbit(wave))))])
    out.append(["bad", None, None, None])  # quarantined container row
    return ["audio_id", "duration_s", "rms", "zero_crossings"], out


def golden_multimodal_video_frames() -> tuple[list[str], list[list]]:
    w, h, n, every_k = 24, 16, 12, 5
    out = [[f"v{i}#{j}", w, h, "png"]
           for i in range(3) for j in range(0, n, every_k)]
    return ["image_id", "w", "h", "fmt"], out


GOLDEN = {
    "image_dedup_pipeline": golden_image_dedup_pipeline,
    "multimodal_image_features": golden_multimodal_image_features,
    "multimodal_audio_features": golden_multimodal_audio_features,
    "multimodal_video_frames": golden_multimodal_video_frames,
}


def main() -> None:
    from tools.check_oracles import rowset

    import __spark_entry__ as E
    from panako_spark.session import get_spark

    spark = get_spark("gen-inline-oracles", cpus=8, shuffle_partitions=16)
    qs = E.queries()
    fixture = {}
    failures = []
    for name, golden_fn in GOLDEN.items():
        cols, grows = golden_fn()
        sdf = qs[name](spark, "/root/testdata/sf0.01")
        scols = sdf.columns
        srows = [[r[c] for c in scols] for r in sdf.collect()]
        if sorted(scols) != sorted(cols):
            failures.append(f"{name}: cols spark={sorted(scols)} "
                            f"golden={sorted(cols)}")
            continue
        sset, gset = rowset(scols, srows), rowset(cols, grows)
        if sset != gset:
            extra = [r for r in sset if r not in gset][:3]
            miss = [r for r in gset if r not in sset][:3]
            failures.append(f"{name}: {len(srows)} spark vs {len(grows)} "
                            f"golden rows; spark-only={extra} "
                            f"golden-only={miss}")
            continue
        fixture[name] = {"columns": cols, "rows": grows}
        print(f"ok   {name}: {len(grows)} golden rows == spark (bit-exact)")
    spark.stop()
    if failures:
        for f in failures:
            print(f"FAIL {f}")
        sys.exit(1)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
