"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Operator coverage mapping (SURVEY.md §2): each query's docstring-free
name encodes the operator it exercises; implementations live in
panako_spark/operators, panako_spark/functions, and the image-dedup
pipeline stages under panako_spark/stages.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from panako_spark.functions import text as TXT
from panako_spark.operators import ann as ANN
from panako_spark.operators import dedup as DD
from panako_spark.operators import pch as PCH
from panako_spark.operators import relational as R

_STOP_SQL = ", ".join(f"'{w}'" for w in TXT.STOPWORDS)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact n-gram-Jaccard near-duplicate pairs over documents
    (the oracle-checkable sibling of the MinHash dedup channel)."""
    return TXT.ngram_jaccard_pairs(spark, "/root/testdata/sf0.001")


def _image_dedup_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-SQL showcase: the full image+caption dedup pipeline on a tiny
    deterministic synthetic corpus. sf_dir is unused — the corpus is
    generated, per FIXTURES.md.

    Gated twice: (a) an inline VALUES oracle (_inline_oracles — the
    committed pair set the pure-Python golden matcher computed, so the
    driver compares rows+schema+hash like every other query), and (b)
    an IN-QUERY gate: the golden matcher re-processes the same corpus
    live and the query RAISES unless the pipeline recovers every golden
    landmark pair and the cluster labels equal the union-find golden —
    a failed parity turns into a driver error, not a silently-green
    row count."""
    import tempfile

    from panako_spark.config import PanakoConfig
    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.io.checkpoint import CheckpointStore
    from panako_spark.kernels.codec import to_gray
    from panako_spark.kernels.matcher import (
        GoldenMatcher, caption_pairs_golden, connected_components_golden,
        phash_pairs_golden,
    )
    from panako_spark.pipeline import run_pipeline

    cfg = PanakoConfig()
    rows, _ = generate_corpus(10, dup_fraction=0.5, seed=7)
    images = spark.createDataFrame(rows_to_pandas(rows))
    store = CheckpointStore(tempfile.mkdtemp(prefix="panako_smoke_"))
    res = run_pipeline(spark, images, store, cfg)

    gm = GoldenMatcher(cfg)
    grays = {r.image_id: to_gray(r.pixels) for r in rows}
    for r in rows:
        gm.store_image(r.image_id, grays[r.image_id], phash=r.phash)
    golden_union = set(gm.dedup_pairs())
    for p in caption_pairs_golden(
            {r.image_id: r.caption for r in rows}, cfg).values():
        golden_union |= p
    golden_union |= phash_pairs_golden(
        {r.image_id: r.phash for r in rows}, cfg)
    golden_union |= gm.tile_rescue_pairs(grays)  # crop-rescue channel
    got = {(r["id_a"], r["id_b"]) for r in
           res.dup_pairs.select("id_a", "id_b").distinct().collect()}
    missing = golden_union - got
    assert not missing, f"pipeline/golden parity failure: {missing}"
    labels = {r["image_id"]: r["cluster_id"]
              for r in res.clusters.collect()}
    golden_labels = connected_components_golden(
        got, [r.image_id for r in rows])
    assert labels == golden_labels, "cluster labels diverge from golden"
    return res.dup_pairs


def _multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image multimodal plumbing: decode -> nearest-neighbor resize ->
    PNG re-encode -> feature extract, all via Arrow-batched mapInPandas.
    sf_dir unused — the corpus is synthetic. Gated twice: an inline
    VALUES oracle (committed golden rowset, full driver compare) plus an
    in-query pure-NumPy golden twin that recomputes every feature from
    the known pixels and RAISES on mismatch."""
    import numpy as np

    from panako_spark.data.synth import generate_corpus, rows_to_pandas
    from panako_spark.kernels.codec import to_gray
    from panako_spark.operators.multimodal import (
        _resize, image_features, resize_images,
    )

    rows, _ = generate_corpus(8, dup_fraction=0.25, seed=11)
    images = spark.createDataFrame(rows_to_pandas(rows))
    feats = image_features(resize_images(images, 32, 32))
    got = {r["image_id"]: r for r in feats.collect()}
    assert len(got) == len(rows)
    for r in rows:
        g_row = got[r.image_id]
        assert g_row["err"] is None, f"{r.image_id}: {g_row['err']}"
        small = _resize(r.pixels, 32, 32)   # PNG roundtrip is lossless
        g = to_gray(small)
        gy, gx = np.gradient(g)
        mag = np.hypot(gx, gy)
        assert np.allclose(g_row["mean_rgb"],
                           [small[..., c].mean() for c in range(3)])
        assert np.isclose(g_row["std_gray"], g.std())
        assert np.isclose(g_row["edge_density"], (mag > 10.0).mean())
    return feats.select("image_id", "std_gray", "edge_density")


def _multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio plumbing gate: deterministic s16le PCM sines -> batched
    duration/RMS/zero-crossing features, NumPy golden in-query; one row
    with an unsupported container fmt must quarantine into err (the
    documented no-ffmpeg seam), not kill the job."""
    import numpy as np

    from panako_spark.operators.multimodal import audio_features

    sr = 8000
    clips = []
    for i in range(6):
        t = np.arange(sr // 2, dtype=np.float64) / sr
        wave = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t))
        pcm = (wave * 32767).astype("<i2").tobytes()
        clips.append((f"a{i}", pcm, sr, "pcm16"))
    clips.append(("bad", b"\x00" * 64, sr, "mp3"))  # container, no ffmpeg
    audio = spark.createDataFrame(
        clips, "audio_id string, bytes binary, sample_rate int, fmt string")
    feats = audio_features(audio)
    got = {r["audio_id"]: r for r in feats.collect()}
    assert got["bad"]["err"] is not None and "ffmpeg" in got["bad"]["err"]
    for aid, pcm, s, fmt in clips[:-1]:
        wave = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
        row = got[aid]
        assert row["err"] is None
        assert np.isclose(row["duration_s"], wave.size / s)
        assert np.isclose(row["rms"], np.sqrt(np.mean(wave ** 2)))
        assert row["zero_crossings"] == int(
            np.count_nonzero(np.diff(np.signbit(wave))))
    return feats.select("audio_id", "duration_s", "rms", "zero_crossings")


def _multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video plumbing gate: rawrgb frame concatenations -> every-k frame
    sampling -> image rows shaped for the landmark extract stage. The
    golden checks sampled indices and exact pixel roundtrip per frame."""
    import numpy as np

    from panako_spark.kernels.codec import decode
    from panako_spark.operators.multimodal import video_dedup_frames

    rng = np.random.default_rng(23)
    w, h, n = 24, 16, 12
    vids = {}
    for i in range(3):
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        vids[f"v{i}"] = frames
    video = spark.createDataFrame(
        [(vid, fr.tobytes(), "rawrgb", n, w, h)
         for vid, fr in vids.items()],
        "video_id string, bytes binary, fmt string, "
        "n_frames int, w int, h int")
    out = video_dedup_frames(video, every_k=5)
    got = out.collect()
    expected_ids = {f"{vid}#{i}" for vid in vids for i in range(0, n, 5)}
    assert {r["image_id"] for r in got} == expected_ids
    for r in got:
        vid, idx = r["image_id"].split("#")
        img = decode(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        assert np.array_equal(img, vids[vid][int(idx)])
    return out.select("image_id", "w", "h", "fmt")


def _minhash_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from panako_spark.operators.dedup import minhash_dup_pairs

    return minhash_dup_pairs(spark, sf_dir, verify="exact")


def _simhash_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from panako_spark.operators.dedup import simhash_dup_pairs

    return simhash_dup_pairs(spark, sf_dir, verify="exact")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- relational operators (SURVEY.md §2.3/§2.4) ---
        "stats_scan": R.stats_scan,                      # S9
        "min_hits_gate": R.min_hits_gate,                # Q5
        "head_tail_sublist": R.head_tail_sublist,        # Q7
        "delta_t_mode": R.delta_t_mode,                  # Q8
        "topk_per_group": R.topk_per_group,              # Q16
        "near_hash_band_join": R.near_hash_band_join,    # Q1
        "avoid_filter": R.avoid_filter,                  # Q2
        "resource_lookup_join": R.resource_lookup_join,  # Q20
        "coverage_histogram": R.coverage_histogram,      # Q13
        "windowed_monitor": R.windowed_monitor,          # Q14
        "pch_circular_match": PCH.pch_circular_match,    # Q21
        # --- text analysis / dedup family (training-data pipeline) ---
        "token_count": TXT.token_count,
        "token_count_bpe": TXT.token_count_bpe,
        "quality_score": TXT.quality_score,
        "lang_id": TXT.lang_id,
        "doc_fingerprint": TXT.doc_fingerprint,
        "prefix_dup_groups": TXT.prefix_dup_groups,
        "exact_dup_groups": TXT.exact_dup_groups,
        "ngram_jaccard_pairs": TXT.ngram_jaccard_pairs,
        # --- similarity search / embedding dedup ---
        "embedding_topk": ANN.cosine_topk_bruteforce,
        "embedding_near_dup": ANN.cosine_near_dup_pairs,
        "embedding_lsh_neighbors": ANN.lsh_bucketed_neighbors,
        "embedding_ivf_topk": ANN.ivf_topk,
        # --- signature operators: LSH-band candidates + exact verify ---
        # (candidates from the signature bands — the mechanism under
        # test — output filtered on the exact shingle Jaccard the oracle
        # recomputes; match <=> the banding achieves full recall)
        "minhash_dup_pairs_docs": _minhash_docs_exact,
        "simhash_dup_pairs_docs": _simhash_docs_exact,
        # --- full image pipeline (inline VALUES oracle + IN-QUERY golden
        #     parity assertions: a parity failure raises -> driver error)
        "image_dedup_pipeline": _image_dedup_smoke,
        # --- multimodal plumbing (decode/resize/feature/frame-sample);
        # inline VALUES oracles like the pipeline smoke, plus the
        # in-query NumPy golden parity, which raises on any mismatch ---
        "multimodal_image_features": _multimodal_image_features,
        "multimodal_audio_features": _multimodal_audio_features,
        "multimodal_video_frames": _multimodal_video_frames,
    }


def _exact_jaccard_oracle(threshold: float = 0.5) -> str:
    """Exact token-3-gram Jaccard pairs over documents (the verification
    half of the exact-verified LSH queries)."""
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(0, len(t) - 2),
                        i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                   AS s
          FROM toks),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT id_a, id_b,
               inter / (na.n + nb.n - inter) AS jaccard
        FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE inter / (na.n + nb.n - inter) >= {threshold}
    """


def _lsh_neighbors_oracle(n_bits: int = 16, bands: int = 4,
                          threshold: float = 0.4, dim: int = 64) -> str:
    """Full DuckDB replica of lsh_bucketed_neighbors: the deterministic
    hyperplanes are emitted as SQL literals, sign bits / band keys /
    bucket join / exact-cosine verify all recomputed — list_dot_product
    sums in the same order as Spark's zip_with+aggregate fold, so every
    double (and therefore every sign bit) matches bit-exactly."""
    from panako_spark.operators.ann import _hyperplanes

    planes = _hyperplanes(dim, n_bits)
    lits = ", ".join(
        "[" + ", ".join(repr(float(v)) for v in row) + "]"
        for row in planes)
    bpb = n_bits // bands
    band_exprs = ", ".join(
        f"'b{b}:' || " + " || ".join(
            f"CAST(bits[{b * bpb + i + 1}] AS INT)" for i in range(bpb))
        for b in range(bands))
    return f"""
        WITH sig AS (
          SELECT vec_id,
                 list_transform([{lits}]::DOUBLE[][],
                   p -> list_dot_product(embedding::DOUBLE[], p) > 0.0)
                   AS bits
          FROM embeddings),
        keyed AS (SELECT vec_id, unnest([{band_exprs}]) AS key FROM sig),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keyed a JOIN keyed b
            ON a.key = b.key AND a.vec_id < b.vec_id),
        u AS (
          SELECT vec_id,
                 list_transform(embedding::DOUBLE[],
                   v -> v / sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[])))
                   AS ue
          FROM embeddings)
        SELECT id_a, id_b, list_dot_product(ua.ue, ub.ue) AS cos
        FROM cand
        JOIN u ua ON ua.vec_id = id_a
        JOIN u ub ON ub.vec_id = id_b
        WHERE list_dot_product(ua.ue, ub.ue) >= {threshold}
    """


def _ivf_topk_oracle(n_cells: int = 16, n_probe: int = 8,
                     n_queries: int = 10, k: int = 5, dim: int = 64,
                     n_assign: int = 2) -> str:
    """Full DuckDB replica of ivf_topk: literal centroids, argmax cell
    assignment, top-n_probe probe cells via the same struct-sort
    tie-break (score desc, cell asc), exact re-rank within probed
    cells. Centroids are k-means-trained from the same deterministic
    sample as the Spark operator (ann.train_ivf_centroids — pure
    float64 NumPy on identical bytes), so the literals match
    bit-exactly."""
    from panako_spark.operators.ann import (
        ivf_sample_duckdb, train_ivf_centroids,
    )

    cents = train_ivf_centroids(
        ivf_sample_duckdb("/root/testdata/sf0.01"), n_cells)
    lits = ", ".join(
        "[" + ", ".join(repr(float(v)) for v in row) + "]"
        for row in cents)
    return f"""
        WITH u AS (
          SELECT vec_id,
                 list_transform(embedding::DOUBLE[],
                   v -> v / sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[])))
                   AS ue
          FROM embeddings),
        scored AS (
          SELECT vec_id, ue,
                 list_transform([{lits}]::DOUBLE[][],
                   c -> list_dot_product(ue, c)) AS scores
          FROM u),
        corpus AS (
          SELECT vec_id, ue,
                 unnest(list_transform(list_slice(list_sort(
                   list_transform(scores,
                                  (s, i) -> {{'s': -s, 'i': i - 1}})),
                   1, {n_assign}), x -> x.i)) AS cell
          FROM scored),
        probes AS (
          SELECT vec_id AS query_id, ue AS qe,
                 unnest(list_transform(list_slice(list_sort(
                   list_transform(scores,
                                  (s, i) -> {{'s': -s, 'i': i - 1}})),
                   1, {n_probe}), x -> x.i)) AS cell
          FROM scored WHERE vec_id < {n_queries}),
        cand AS (
          SELECT DISTINCT p.query_id, p.qe, c.vec_id AS neighbor_id, c.ue
          FROM probes p JOIN corpus c USING (cell)
          WHERE p.query_id != c.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_dot_product(qe, ue) DESC,
                            neighbor_id ASC) AS rnk
          FROM cand)
        SELECT query_id, neighbor_id, rnk FROM ranked WHERE rnk <= {k}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "stats_scan": """
            SELECT count(*) AS n_rows,
                   sum(l_quantity) AS sum_qty,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty,
                   avg(l_quantity) AS avg_qty
            FROM lineitem
        """,
        "min_hits_gate": """
            SELECT l_orderkey, count(*) AS n_hits
            FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 5
        """,
        "head_tail_sublist": """
            WITH d AS (SELECT DISTINCT l_orderkey, l_linenumber
                       FROM lineitem),
            r AS (
              SELECT l_orderkey, l_linenumber,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber ASC) AS ra,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber DESC) AS rd
              FROM d)
            SELECT l_orderkey, l_linenumber FROM r WHERE ra <= 2 OR rd <= 2
        """,
        "delta_t_mode": """
            WITH c AS (
              SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY user_id, event_type),
            r AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type ASC) AS rk
              FROM c)
            SELECT user_id, event_type AS mode_event FROM r WHERE rk = 1
        """,
        "topk_per_group": """
            WITH r AS (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey ASC) AS rnk
              FROM orders)
            SELECT o_custkey, o_orderkey, rnk FROM r WHERE rnk <= 3
        """,
        "near_hash_band_join": """
            WITH h AS (
              SELECT p_partkey, (p_partkey * 2654435761) % 1000 AS h
              FROM part)
            SELECT DISTINCT a.p_partkey AS id_a, b.p_partkey AS id_b
            FROM h a JOIN h b
              ON b.h BETWEEN a.h - 2 AND a.h + 2
            WHERE a.p_partkey < b.p_partkey
        """,
        "avoid_filter": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 450000)
        """,
        "resource_lookup_join": """
            SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "coverage_histogram": """
            WITH e AS (
              SELECT user_id,
                     CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
              FROM events)
            SELECT user_id,
                   count(DISTINCT hr) AS filled_hours,
                   max(hr) - min(hr) + 1 AS span_hours,
                   count(DISTINCT hr) / (max(hr) - min(hr) + 1) AS coverage
            FROM e GROUP BY user_id
        """,
        "windowed_monitor": """
            WITH e AS (
              SELECT CAST(floor(epoch(ts) / 1200) AS BIGINT) AS bucket,
                     user_id, value
              FROM events)
            SELECT bucket, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                     AS sum_value
            FROM e GROUP BY bucket
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "token_count_bpe": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text),
                        '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH t AS (SELECT doc_id, length(text) AS lc,
                              string_split(text, ' ') AS toks
                       FROM documents)
            SELECT doc_id,
                   lc / len(toks) AS mean_token_len,
                   len(list_filter(toks, x -> x IN ({_STOP_SQL})))
                     / len(toks) AS stopword_ratio
            FROM t
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents)
            SELECT doc_id,
                   CASE WHEN len(list_filter(toks, x -> x IN ({_STOP_SQL})))
                             / len(toks) >= 0.05
                        THEN 'en' ELSE 'unk' END AS lang_guess
            FROM t
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   array_to_string(string_split(text, ' ')[1:8], ' ')
                     AS prefix_key
            FROM documents
        """,
        "prefix_dup_groups": """
            WITH f AS (
              SELECT array_to_string(string_split(text, ' ')[1:8], ' ')
                       AS prefix_key
              FROM documents)
            SELECT prefix_key, count(*) AS n_docs
            FROM f GROUP BY prefix_key HAVING count(*) > 1
        """,
        "exact_dup_groups": """
            WITH docs2 AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents
              WHERE doc_id % 25 = 0)
            SELECT md5(text) AS content_key, count(*) AS n_docs,
                   min(doc_id) AS rep_doc
            FROM docs2 GROUP BY md5(text) HAVING count(*) > 1
        """,
        "ngram_jaccard_pairs": f"""
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
              WHERE len(string_split(text, ' ')) >= 3),
            sh_all AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(range(0, len(t) - 2),
                            i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
                       AS s
              FROM toks),
            hot AS (SELECT s FROM sh_all GROUP BY s
                    HAVING count(*) > {TXT.MAX_SHINGLE_DF}),
            sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all
                   ANTI JOIN hot ON sh_all.s = hot.s),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   inter / (na.n + nb.n - inter) AS jaccard
            FROM inter
            JOIN sizes na ON na.doc_id = id_a
            JOIN sizes nb ON nb.doc_id = id_b
            WHERE inter / (na.n + nb.n - inter) >= 0.5
        """,
        # unit-normalize once per vector, then dot per pair — the same
        # element order as the Spark transform/zip_with/aggregate chain so
        # the doubles match bit-exact
        "embedding_topk": """
            WITH u AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                       v -> v / sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[])))
                       AS ue
              FROM embeddings),
            s AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_dot_product(q.ue, c.ue) AS cos
              FROM u q CROSS JOIN u c
              WHERE q.vec_id < 10 AND q.vec_id != c.vec_id),
            r AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC,
                                                 neighbor_id ASC) AS rnk
              FROM s)
            SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 5
        """,
        "pch_circular_match": PCH.pch_oracle_sql(),
        # exact-verified LSH dedup: oracle = exact Jaccard >= threshold;
        # the Spark side only matches if the signature banding finds
        # every true pair (full-recall check, deterministic seeds)
        "minhash_dup_pairs_docs": _exact_jaccard_oracle(
            DD.DOC_JACCARD_THRESHOLD),
        "simhash_dup_pairs_docs": _exact_jaccard_oracle(
            DD.DOC_JACCARD_THRESHOLD),
        "embedding_lsh_neighbors": _lsh_neighbors_oracle(),
        "embedding_ivf_topk": _ivf_topk_oracle(),
        "embedding_near_dup": """
            WITH u AS (
              SELECT vec_id,
                     list_transform(embedding::DOUBLE[],
                       v -> v / sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[])))
                       AS ue
              FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.ue, b.ue) AS cos
            FROM u a JOIN u b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.ue, b.ue) >= 0.4
        """,
        **_inline_oracles(),
    }


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr round-trips float64 exactly; the explicit ::DOUBLE stops
        # DuckDB from typing the literal as DECIMAL (which would come
        # back as Decimal, not float, and fail the bit-exact compare)
        # the repr must be quoted: a bare numeric literal is typed
        # DECIMAL(w,s) before the cast, dropping the last ulp
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _inline_oracles() -> dict[str, str]:
    """Oracles for the 4 queries over deterministic SYNTHETIC corpora
    (no testdata table to recompute from): the expected rowsets are
    computed by the pure-Python golden twins — matcher/NumPy, never the
    Spark code under test — cross-checked bit-exact against Spark, and
    committed by tools/gen_inline_oracles.py. Rendered here as VALUES
    literals so the driver's rows+schema+hash compare gates them exactly
    like the table-backed queries (closes the r4 no_oracle rows)."""
    import json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "golden", "inline_oracles.json")
    try:
        with open(path) as f:
            fixture = json.load(f)
    except OSError as e:
        # degrading to no-oracle must be LOUD: a deploy that drops
        # tests/golden/ would otherwise silently revert these 4 queries
        # to the weaker rows-only check and look identical to a pass
        print(f"__spark_entry__: WARNING — inline oracle fixture "
              f"unreadable ({e}); 4 synthetic-corpus queries degrade "
              "to no-oracle checks", file=sys.stderr, flush=True)
        return {}
    out = {}
    for name, spec in fixture.items():
        cols = ", ".join(spec["columns"])
        rows = ",\n              ".join(
            "(" + ", ".join(_sql_lit(v) for v in row) + ")"
            for row in spec["rows"])
        out[name] = (f"SELECT * FROM (VALUES\n              {rows}\n"
                     f"            ) AS t({cols})")
    return out
