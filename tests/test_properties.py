"""Property-based tests (hypothesis): invariants that hold for ALL inputs,
not just fixtures.

- Scrub idempotency: redact(redact(x)) == redact(x) — tokens are fixed
  points of the rule chain (no rule pattern matches any token).
- Scrub completeness: no raw rule pattern survives in scrubbed output.
- HL7 round-trip: building a PID segment from field values then parsing it
  recovers exactly the values (for values without HL7 structural chars).
- row_hash_agg order-insensitivity: the digest ignores row order and
  partitioning.

Batched: hypothesis generates the corpus, ONE Spark job checks all rows —
per-example Spark jobs would be hundreds of ~1s round-trips.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.functions.scrub import (
    DEFAULT_PHI_RULES,
    redact_expr,
)
from fda_clinical_etl_pipeline_spark.functions import hl7 as hl7f
from fda_clinical_etl_pipeline_spark.sources.writers import row_hash_agg

# printable text, newline-free (one value per row)
texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=120,
)

# HL7 field values: no |, ^, \n (structural chars), no leading/trailing
# whitespace loss concerns
hl7_field = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, exclude_characters="|^~\\"
    ),
    min_size=1,
    max_size=20,
).filter(lambda s: s.strip() == s and s != "")


def _python_redact(text: str) -> str:
    """Independent reimplementation of the reference semantics
    (etl/scrub_phi.py:18-35) to differential-test the Spark expression."""
    out = text
    for rule in sorted(DEFAULT_PHI_RULES, key=lambda r: r.rule_id):
        out = re.sub(rule.pattern, rule.replacement, out, flags=re.IGNORECASE)
    return out


@settings(max_examples=30, deadline=None)
@given(st.lists(texts, min_size=1, max_size=40))
def test_scrub_matches_python_reference_and_is_idempotent(spark, batch):
    df = spark.createDataFrame([(t,) for t in batch], "t string")
    rows = df.select(
        F.col("t"),
        redact_expr("t").alias("once"),
        redact_expr(redact_expr("t")).alias("twice"),
    ).collect()
    for r in rows:
        assert r["once"] == _python_redact(r["t"]), (
            f"spark vs python redact diverge on {r['t']!r}"
        )
        assert r["twice"] == r["once"], f"not idempotent on {r['t']!r}"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(hl7_field, hl7_field, hl7_field, hl7_field),
        min_size=1,
        max_size=30,
    )
)
def test_hl7_build_parse_roundtrip(spark, field_rows):
    msgs = []
    for pid3, pid5, pid7, pid11 in field_rows:
        msgs.append(
            (
                "MSH|^~\\&|A|B\n"
                f"PID|1||{pid3}||{pid5}||{pid7}|M|||{pid11}\n"
                "OBX|1|ST|R||42",
            )
        )
    df = spark.createDataFrame(msgs, "message string").withColumn(
        "segments", F.split("message", "\n")
    )
    got = df.select(
        hl7f.pid_field(F.col("segments"), 3).alias("p3"),
        hl7f.pid_field(F.col("segments"), 5).alias("p5"),
        hl7f.pid_field(F.col("segments"), 7).alias("p7"),
        hl7f.pid_field(F.col("segments"), 11).alias("p11"),
    ).collect()
    for (pid3, pid5, pid7, pid11), r in zip(field_rows, got):
        assert (r["p3"], r["p5"], r["p7"], r["p11"]) == (pid3, pid5, pid7, pid11)


def test_row_hash_agg_order_insensitive(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, v string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(3)
    assert row_hash_agg(a) == row_hash_agg(b)
    c = spark.createDataFrame(rows[:-1] + [(999, "x")], "id long, v string")
    assert row_hash_agg(a) != row_hash_agg(c)


def test_row_hash_agg_multiset_sensitive(spark):
    """An XOR combiner cancels rows occurring an even number of times;
    the modular-sum digest must distinguish multiplicities."""
    rows = [(i, f"v{i}") for i in range(10)]
    base = spark.createDataFrame(rows, "id long, v string")
    dup_pair = spark.createDataFrame(rows + [rows[0], rows[0]],
                                     "id long, v string")
    dup_once = spark.createDataFrame(rows + [rows[0]], "id long, v string")
    d0, d2, d1 = row_hash_agg(base), row_hash_agg(dup_pair), row_hash_agg(dup_once)
    assert len({d0, d1, d2}) == 3
    empty = spark.createDataFrame([], "id long, v string")
    assert row_hash_agg(empty) == "0" * 16 + "0" * 8


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a driver-side union-find on
    arbitrary small graphs (self-loops and duplicate edges included)."""
    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_star_matches_union_find(spark, edges):
    """The large-star/small-star engine must agree with a driver-side
    union-find on arbitrary small graphs (self-loops and duplicate
    edges included) — same contract as the min-label engine, so the two
    are interchangeable."""
    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    assert got == expected


@given(st.lists(st.integers(1, 400), min_size=1, max_size=8))
@settings(max_examples=8, deadline=None)
def test_chunking_covers_every_token_once_per_stride(spark, doc_lens):
    """Chunk invariants for any document length: chunk starts advance by
    the stride, the last chunk reaches the final token, and every chunk
    holds between 1 and CHUNK_TOKENS tokens."""
    from fda_clinical_etl_pipeline_spark.operators.llmprep import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    rows = [
        (i, " ".join(f"w{j}" for j in range(n)))
        for i, n in enumerate(doc_lens)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in enumerate(doc_lens):
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        starts = [c["chunk_start"] for c in chunks]
        assert starts == list(range(1, n + 1, CHUNK_STRIDE))
        # last chunk covers through the final token; none is empty/oversize
        last = chunks[-1]
        assert last["chunk_start"] + last["n_chunk_tokens"] - 1 == n
        assert all(1 <= c["n_chunk_tokens"] <= CHUNK_TOKENS for c in chunks)


def test_entropy_and_mix_invariants(spark):
    """Mathematical invariants of the round-5 operators on real data:
    0 <= token entropy <= ln(n_distinct) with equality-at-zero iff a
    single distinct token; mixture weights sum to 1 and allocations
    never exceed the budget; DSIR weights are finite."""
    import math

    from fda_clinical_etl_pipeline_spark.operators.llmprep import (
        MIX_TOKEN_BUDGET,
    )
    from fda_clinical_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"

    ent = {r["doc_id"]: r for r in qs["text_token_entropy"].fn(spark, sf).collect()}
    rep = {r["doc_id"]: r for r in qs["text_repetition_stats"].fn(spark, sf).collect()}
    assert set(ent) == set(rep)
    for doc_id, r in ent.items():
        n_distinct = round(rep[doc_id]["distinct_ratio"] * r["n_tokens"])
        assert -1e-9 <= r["token_entropy"] <= math.log(max(n_distinct, 1)) + 1e-4, (
            doc_id, r["token_entropy"], n_distinct
        )
        if n_distinct == 1:
            assert r["token_entropy"] == 0.0

    mix = qs["llm_token_budget_mix"].fn(spark, sf).collect()
    assert abs(sum(r["mix_weight"] for r in mix) - 1.0) < 1e-2
    assert sum(r["alloc_tokens"] for r in mix) <= MIX_TOKEN_BUDGET
    assert all(r["repeat_factor"] > 0 for r in mix)

    dsir = qs["llm_dsir_weights"].fn(spark, sf).collect()
    assert all(math.isfinite(r["dsir_logratio"]) for r in dsir)
    # smoothing bounds: |mean log ratio| can never exceed the extreme
    # single-bucket log ratio
    assert all(abs(r["dsir_logratio"]) < 20 for r in dsir)


@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=200),
    st.integers(2, 12),
)
@settings(max_examples=10, deadline=None)
def test_global_ntile_matches_single_partition_ntile(spark, values, k):
    """Distributed two-phase NTILE must agree ROW-FOR-ROW with the
    reference single-partition ntile() window for any input multiset
    and bucket count — including duplicates and n < k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.advanced import (
        global_ntile,
    )

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long")
    ours = {
        (r["id"], r["v"]): r["b"]
        for r in global_ntile(
            df, k, "v", "id", num_partitions=7, out_col="b"
        ).collect()
    }
    w = Window.orderBy("v", "id")
    ref = {
        (r["id"], r["v"]): r["b"]
        for r in df.withColumn("b", F.ntile(k).over(w)).collect()
    }
    assert ours == ref


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3),   # height in blocks-ish (small)
    st.integers(1, 3),
    st.integers(40, 95),  # quality
    st.randoms(use_true_random=False),
)
def test_jpeg_roundtrip_bounded_error(hb, wb, quality, rnd):
    """Any uint8 image round-trips through the baseline JPEG codec with
    bounded reconstruction error: mean abs error under a loose cap that
    holds even for adversarial high-frequency content, and exact
    dimensions. No Spark needed — this pins the pure codec."""
    import numpy as np

    from fda_clinical_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    h = hb * 7 + 1  # deliberately non-multiples of 8
    w = wb * 9 + 2
    rng = np.random.RandomState(rnd.randrange(2 ** 31))
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    dw, dh, out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert (dw, dh) == (w, h)
    # random noise is JPEG's worst case (measured MAE ~51 at q=40);
    # the contract pinned here is bounded error + exact dims, not
    # fidelity on adversarial content — fidelity is pinned on smooth
    # images in test_multimodal
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 64.0


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_jpeg_decode_never_crashes(data):
    """Arbitrary bytes (including truncated/corrupt streams with valid
    SOI prefixes) must raise ValueError, never any other exception —
    the quarantine contract of the multimodal operators."""
    import pytest as _pytest

    from fda_clinical_etl_pipeline_spark.operators.jpeg import decode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8" + data)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ).filter(lambda ps: any(a != b for a, b in ps))
)
def test_pagerank_tracks_float_reference(spark, pairs):
    """Integer micro-unit PageRank must agree with an independent float
    implementation within truncation slack on arbitrary graphs."""
    from fda_clinical_etl_pipeline_spark.operators.graph import (
        TOTAL_MASS,
        pagerank,
    )

    edges = sorted({(a, b) for a, b in pairs if a != b})
    und = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(und, "src long, dst long")
    got = {
        r.node: r.rank for r in pagerank(df, iterations=3).collect()
    }

    # float reference
    nodes = sorted({a for a, _ in und})
    deg = {n: sum(1 for a, _ in und if a == n) for n in nodes}
    rank = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(3):
        inflow = {n: 0.0 for n in nodes}
        for a, b in und:
            inflow[b] += rank[a] / deg[a]
        rank = {n: 0.15 / len(nodes) + 0.85 * inflow[n] for n in nodes}

    assert set(got) == set(nodes)
    for n in nodes:
        # integer truncation loses < 1 unit per division; slack is
        # generous vs TOTAL_MASS=1e12
        assert abs(got[n] / TOTAL_MASS - rank[n]) < 1e-6


@settings(max_examples=15, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_all_decoders_quarantine_contract(data):
    """Every codec in the multimodal surface must raise ValueError (and
    ONLY ValueError) on arbitrary bytes — including bytes that carry a
    valid magic prefix. Any other exception class would break the
    error-row quarantine in the mapInPandas operators."""
    from fda_clinical_etl_pipeline_spark.operators.jpeg import decode_jpeg
    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        decode_avi_frames,
        decode_bmp,
        decode_dicom,
        decode_gif,
        decode_gif_frames,
        decode_png,
        decode_ppm,
        decode_tiff,
        decode_wav_g711,
        decode_wav_ima_adpcm,
        decode_wav_pcm16,
        probe_adts,
        probe_avi,
        probe_dicom,
        probe_h264,
        probe_matroska,
        probe_mp4,
        probe_mpeg_audio,
        probe_mpegts,
        probe_ogg,
    )
    from fda_clinical_etl_pipeline_spark.operators.flac import probe_flac

    cases = [
        (decode_png, b"\x89PNG\r\n\x1a\n"),
        (decode_gif, b"GIF89a"),
        (decode_gif_frames, b"GIF89a"),
        (decode_jpeg, b"\xff\xd8"),
        (decode_ppm, b"P6\n"),
        (decode_wav_pcm16, b"RIFF\x10\x00\x00\x00WAVE"),
        (decode_wav_ima_adpcm, b"RIFF\x10\x00\x00\x00WAVE"),
        (decode_wav_g711, b"RIFF\x10\x00\x00\x00WAVE"),
        (decode_avi_frames, b"RIFF\x10\x00\x00\x00AVI "),
        (probe_avi, b"RIFF\x10\x00\x00\x00AVI "),
        (probe_mpeg_audio, b"\xff\xfb"),
        (probe_mpegts, b"\x47" + b"\x00" * 187 + b"\x47"),
        (probe_mp4, b"\x00\x00\x00\x10ftypisom"),
        (probe_ogg, b"OggS"),
        (probe_matroska, b"\x1aE\xdf\xa3"),
        (probe_h264, b"\x00\x00\x00\x01"),
        (probe_flac, b"fLaC"),
        (probe_adts, b"\xff\xf1"),
        (decode_dicom, b"\x00" * 128 + b"DICM"),
        (probe_dicom, b"\x00" * 128 + b"DICM"),
        (decode_tiff, b"II*\x00"),
        (decode_tiff, b"MM\x00*"),
        (decode_bmp, b"BM"),
    ]
    for fn, magic in cases:
        for payload in (data, magic + data):
            try:
                fn(payload)
            except ValueError:
                pass
            except Exception as exc:  # noqa: BLE001 — the assertion
                raise AssertionError(
                    f"{fn.__name__} leaked {type(exc).__name__}: {exc!r}"
                ) from exc


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)),
        min_size=1,
        max_size=40,
    ).filter(lambda ps: any(a != b for a, b in ps))
)
def test_triangle_counts_match_brute_force(spark, pairs):
    """The adjacency-intersection triangle formulation must agree with
    an itertools brute force on arbitrary graphs (duplicates, reversed
    edges, self-loops included in the input)."""
    from itertools import combinations

    from fda_clinical_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({n for e in edges for n in e})
    want = {}
    for a, b, c in combinations(nodes, 3):
        if ({(a, b), (a, c), (b, c)} <= edges):
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1

    df = spark.createDataFrame(sorted(pairs), "u long, v long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 5000),     # duration_ms
    st.integers(0, 12),       # n_video (0 = audio-only)
    st.integers(1, 12),       # n_audio
    st.sampled_from(["aac", "mp3", "ac3"]),
    st.sampled_from(["h264", "hevc"]),
)
def test_mpegts_probe_roundtrip_property(duration_ms, n_video, n_audio,
                                         audio_codec, video_codec):
    """For ANY fixture parameters, the TS probe must recover exactly
    the PSI/PCR facts the writer encoded: packet count, stream set,
    PCR PID (first declared stream), duration from the PCR span, zero
    continuity errors."""
    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        _TS_AUDIO_PID,
        _TS_VIDEO_PID,
        encode_mpegts_stub,
        probe_mpegts,
    )

    blob = encode_mpegts_stub(
        duration_ms, n_video=n_video, n_audio=n_audio,
        audio_codec=audio_codec, video_codec=video_codec,
    )
    m = probe_mpegts(blob)
    assert m["n_packets"] == 2 + n_video + n_audio
    assert m["n_programs"] == 1
    assert m["n_streams"] == (1 if n_video == 0 else 2)
    assert m["video_codec"] == (video_codec if n_video else None)
    assert m["audio_codec"] == audio_codec
    assert m["pcr_pid"] == (_TS_VIDEO_PID if n_video else _TS_AUDIO_PID)
    # a single PCR packet (count == 1 on the PCR PID) yields no span
    pcr_packets = n_video if n_video else n_audio
    if pcr_packets > 1:
        assert m["duration_s"] == round(duration_ms / 1000.0, 3)
    assert m["cc_errors"] == 0
    assert m["es_packets"] == {
        pid: cnt
        for pid, cnt in ((_TS_VIDEO_PID, n_video),
                         (_TS_AUDIO_PID, n_audio))
        if cnt
    }
