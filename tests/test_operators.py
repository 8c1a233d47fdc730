"""Behavioral tests for the extension operators: the LSH pipeline must
actually FIND the planted near-duplicates, ANN must stay inside its
bucket, and the multimodal decode stub must both raise and fake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from informixcdc_spark.catalog import load_table
from informixcdc_spark.operators.dedup import (
    doc_shingles,
    lsh_candidate_pairs,
    minhash_bands,
    ngram_jaccard_pairs,
    perturbed_copies,
)
from informixcdc_spark.operators.multimodal import (
    decode_stub,
    payload_metadata,
    to_binary_payload,
)
from informixcdc_spark.operators.similarity import ann_knn, brute_force_knn
from tests.conftest import examples, iterations  # noqa: E402


def test_lsh_finds_planted_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    corpus = docs.unionByName(perturbed_copies(docs, "doc_id", "text"))
    shingled = doc_shingles(corpus, "doc_id", "text")
    pairs = lsh_candidate_pairs(minhash_bands(shingled, "doc_id"), "doc_id")
    verified = ngram_jaccard_pairs(pairs, shingled, "doc_id", threshold=0.8)
    found = {
        (r["id_a"], r["id_b"]) for r in verified.collect()
    }
    planted = {(i, i + 1_000_000) for (i,) in docs.select("doc_id").collect()}
    recall = len(found & planted) / len(planted)
    # 4 bands × 2 rows on ~0.99-jaccard pairs: recall should be near 1
    assert recall > 0.9, f"recall={recall}, found={len(found)}"


def test_ann_candidates_subset_of_bruteforce_space(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_knn(emb, queries, k=3)
    approx = ann_knn(emb, queries, k=3)
    assert exact.count() == 15
    # ANN returns at most k per query, all from the query's own bucket
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q)
    buckets = approx.select("query_id", "bucket").distinct().groupBy("query_id").count()
    assert all(r["count"] == 1 for r in buckets.collect())


def test_multimodal_stub_raises_without_codecs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    payload = to_binary_payload(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        decode_stub(payload, fake=False).collect()


def test_multimodal_fake_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    payload = to_binary_payload(docs, "doc_id", "text")
    a = decode_stub(payload, fake=True).orderBy("doc_id").collect()
    b = decode_stub(payload, fake=True).orderBy("doc_id").collect()
    assert a == b
    assert all(len(r["feature"]) == 8 for r in a)
    meta = payload_metadata(payload).orderBy("doc_id").collect()
    assert all(m["n_bytes"] > 0 for m in meta)


def test_resize_stub_fake_and_boundary(spark, sf_dir):
    import pytest
    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.operators.multimodal import resize_stub, to_binary_payload

    docs = load_table(spark, sf_dir, "documents").limit(20)
    binary = to_binary_payload(docs, "doc_id", "text")
    out = resize_stub(binary, width=4, height=4, fake=True).collect()
    assert len(out) == 20
    assert all(len(bytes(r.payload)) == 16 for r in out)  # exact raster size
    assert all(r.width == 4 and r.height == 4 for r in out)
    # without fake=True the missing-codec boundary must raise, not silently fake
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        resize_stub(binary, fake=False).collect()


def test_dedup_clusters_transitive_chain(spark, sf_dir):
    # a~b and b~c but NOT a~c: all three must land in one cluster — the
    # property pairwise candidate output cannot express
    from informixcdc_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id LONG")
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs, nodes, "doc_id").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_clusters_star_matches_label_prop(spark):
    """Star contraction and label propagation must produce identical
    component-min labels on a mixed graph (chain + triangle + isolated
    nodes + out-of-order ids)."""
    from informixcdc_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (50, 7), (7, 49)],
        "id_a LONG, id_b LONG",
    )
    node_ids = (1, 2, 3, 7, 10, 11, 12, 49, 50, 99, 100)
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id LONG")
    prop = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(pairs, nodes, "doc_id").collect()
    }
    star = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(pairs, nodes, "doc_id").collect()
    }
    assert star == prop
    assert star[50] == 7 and star[49] == 7 and star[12] == 10 and star[99] == 99


def test_star_capped_pairs_preserve_components(spark):
    """star_cap replaces an oversized bucket's all-pairs output with a
    star to the bucket minimum — m-1 pairs instead of m²/2 — and the
    connected components (what e20 grades) must be IDENTICAL."""
    from informixcdc_spark.operators.dedup import (
        dedup_clusters_star,
        lsh_candidate_pairs,
    )

    # 3 buckets: one oversized (6 members), one small (2), one singleton;
    # one doc (20) sits in the big bucket AND bridges to the small one
    rows = [(i, 0, "big") for i in (10, 11, 12, 13, 14, 20)]
    rows += [(i, 1, "small") for i in (20, 30)]
    rows += [(99, 0, "solo")]
    bands = spark.createDataFrame(rows, "doc_id LONG, band_idx INT, band_key STRING")
    nodes = spark.createDataFrame(
        [(i,) for i in (10, 11, 12, 13, 14, 20, 30, 99, 100)], "doc_id LONG"
    )
    exact = lsh_candidate_pairs(bands, "doc_id")
    capped = lsh_candidate_pairs(bands, "doc_id", star_cap=3)
    # the big bucket collapses to a star: 5 pairs instead of 15
    n_exact, n_capped = exact.count(), capped.count()
    assert n_exact == 15 + 1 and n_capped == 5 + 1
    lab_exact = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(exact, nodes, "doc_id").collect()
    }
    lab_capped = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(capped, nodes, "doc_id").collect()
    }
    assert lab_exact == lab_capped
    assert lab_capped[30] == 10  # the bridge doc still merges the buckets
    assert lab_capped[99] == 99 and lab_capped[100] == 100


def test_dedup_clusters_star_beats_label_prop_on_high_diameter(spark):
    """The scale motivation: on a 96-hop path, label propagation needs
    ~one round per hop while large-star/small-star contracts in
    O(log² n) alternations — strictly fewer rounds, same labels."""
    from informixcdc_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    n = 97  # path 0-1-2-...-96: diameter 96
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a LONG, id_b LONG"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id LONG")
    star_stats: dict = {}
    star = dedup_clusters_star(pairs, nodes, "doc_id", stats=star_stats)
    assert {r.cluster_id for r in star.collect()} == {0}
    prop_stats: dict = {}
    prop = dedup_clusters(
        pairs, nodes, "doc_id", max_iter=n + 2, stats=prop_stats
    )
    assert {r.cluster_id for r in prop.collect()} == {0}
    # label prop pays ~diameter rounds; star contraction is logarithmic
    assert star_stats["rounds"] < prop_stats["rounds"]
    assert star_stats["rounds"] <= 10


def test_zorder_key_is_bijective_and_local(spark):
    from informixcdc_spark.operators.curation import zorder_key

    grid = (
        spark.range(256 * 256)
        .select((F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("bigint").alias("y"))
        .withColumn("z", zorder_key("x", "y"))
    )
    rows = grid.collect()
    assert len({r["z"] for r in rows}) == 256 * 256  # bijection on the grid
    assert {r["z"] for r in rows} == set(range(256 * 256))  # exactly [0, 2^16)
    # locality: any aligned 1024-key tile spans a 32×32 (x,y) square
    ext = (
        grid.groupBy((F.col("z") / 1024).cast("bigint").alias("tile"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert all(r["dx"] <= 31 and r["dy"] <= 31 for r in ext)


def test_deterministic_split_fractions_and_stability(spark):
    from informixcdc_spark.operators.curation import deterministic_split

    ids = spark.range(20_000).select(F.col("id").alias("doc_id"))
    counts = {
        r["split"]: r["count"]
        for r in ids.withColumn("split", deterministic_split("doc_id"))
        .groupBy("split")
        .count()
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 12 / 16) < 0.02
    assert abs(counts["val"] / 20_000 - 2 / 16) < 0.02
    # stability: same ids in a different order/partitioning → same labels
    again = {
        r["split"]: r["count"]
        for r in ids.repartition(7)
        .withColumn("split", deterministic_split("doc_id"))
        .groupBy("split")
        .count()
        .collect()
    }
    assert counts == again


def test_redact_pii_counts_and_text(spark):
    from informixcdc_spark.operators.curation import redact_pii

    df = spark.createDataFrame(
        [("mail a@b.io and c.d+e@f-g.org or 555-1234",), ("clean text",)],
        ["t"],
    )
    red, ne, np_ = redact_pii("t")
    got = df.select(red.alias("r"), ne.alias("ne"), np_.alias("np")).collect()
    assert got[0]["r"] == "mail <EMAIL> and <EMAIL> or <PHONE>"
    assert (got[0]["ne"], got[0]["np"]) == (2, 1)
    assert got[1]["r"] == "clean text" and got[1]["ne"] == 0


def test_weighted_keep_realizes_rates(spark):
    from informixcdc_spark.operators.curation import weighted_keep

    rows = (
        spark.range(40_000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("xx").alias("lang"),
        )
        .withColumn("keep", weighted_keep("doc_id", "lang", {"en": 0.5}, 0.125))
        .groupBy("lang")
        .agg(F.avg(F.col("keep").cast("double")).alias("frac"))
        .collect()
    )
    frac = {r["lang"]: r["frac"] for r in rows}
    assert abs(frac["en"] - 0.5) < 0.02
    assert abs(frac["xx"] - 0.125) < 0.02


def test_weighted_keep_rejects_sub_granularity_rates(spark):
    """A positive rate below 1/256 quantizes to a zero threshold —
    i.e. 'keep 0.1%' would silently KEEP NOTHING. Both the Spark
    predicate and its SQL twin must refuse instead (r8 ADVICE)."""
    import pytest

    from informixcdc_spark.operators.curation import (
        sql_weighted_keep,
        weighted_keep,
    )

    with pytest.raises(ValueError, match="granularity"):
        weighted_keep("doc_id", "lang", {"cc": 0.001}, 0.5)
    with pytest.raises(ValueError, match="granularity"):
        weighted_keep("doc_id", "lang", {"en": 0.5}, 0.001)
    with pytest.raises(ValueError, match="granularity"):
        sql_weighted_keep("doc_id", "lang", {"cc": 0.001}, 0.5)
    # rate 0 is a legitimate "drop the stratum" request, not an error
    col = weighted_keep("doc_id", "lang", {"en": 0.0}, 0.5)
    assert col is not None


def test_domain_cap_caps_and_is_partition_invariant(spark):
    from informixcdc_spark.operators.curation import domain_cap

    rows = [(i, f"dom{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = {
        (r["doc_id"], r["source"])
        for r in domain_cap(df, "source", "doc_id", k=5).collect()
    }
    # cap honored per domain
    per_dom: dict[str, int] = {}
    for _, s in kept1:
        per_dom[s] = per_dom.get(s, 0) + 1
    assert all(v == 5 for v in per_dom.values()), per_dom
    # deterministic under a different partitioning (the local prune must
    # not change the exact global answer)
    kept2 = {
        (r["doc_id"], r["source"])
        for r in domain_cap(df.repartition(13), "source", "doc_id", k=5).collect()
    }
    assert kept1 == kept2


def test_domain_cap_null_domain_is_its_own_partition(spark):
    """NULL domains must survive the partition-local prune (pandas
    groupby dropna) and be capped like any other domain."""
    from informixcdc_spark.operators.curation import domain_cap

    rows = [(i, None if i % 2 == 0 else "dom") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = domain_cap(df.repartition(7), "source", "doc_id", k=5).collect()
    per_dom: dict[str | None, int] = {}
    for r in kept:
        per_dom[r["source"]] = per_dom.get(r["source"], 0) + 1
    assert per_dom == {None: 5, "dom": 5}, per_dom


def test_decontaminate_flags_overlap_only(spark):
    from informixcdc_spark.operators.dedup import decontaminate

    rows = [
        (1, "alpha beta gamma delta"),       # shares 'alpha beta gamma' w/ bench
        (2, "zeta eta theta iota"),          # no overlap
        (100, "alpha beta gamma epsilon"),   # the benchmark doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"])
        for r in decontaminate(
            df, "doc_id", "text", F.col("doc_id") >= 100
        ).collect()
    }
    assert out == {1: (2, 1)}  # doc 2 clean => absent; doc 1: 1 of 2 shingles hit


def test_repetition_stats_flags_degenerate_doc(spark):
    from informixcdc_spark.operators.textstats import repetition_stats

    rows = [
        (1, "spam spam spam spam spam"),
        (2, "one two three four five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["low_quality"] and out[1]["dup_2gram_frac"] == 0.75
    assert not out[2]["low_quality"] and out[2]["distinct_ratio"] == 1.0


def test_bench_line_fits_driver_tail():
    """The bench JSON line must fit the driver's 2000-char stdout tail,
    even with the full 50-query registry and a burst of long errors."""
    import json as _json

    import bench

    per_query = {f"x{i:02d}_some_longer_query_name_here": 123.456 for i in range(60)}
    errors = {f"y{i:02d}_failing_query": "E" * 500 for i in range(20)}
    line = bench.format_line(per_query, errors, 0.1)
    assert len(line) < 1900, len(line)
    parsed = _json.loads(line)
    assert parsed["metric"] == "total_query_wall_seconds"
    assert parsed["sf"] == 0.1


def test_bench_line_per_query_steal():
    """r11 verdict item 1: the stdout JSON carries per-query best-rep
    steal so a consumer can mechanically discard confounded points —
    and under length pressure the steal dict is dropped BEFORE the
    queries dict (the contract core outlives the diagnostics)."""
    import json as _json

    import bench

    per_query = {f"q{i:02d}_name": 1.5 for i in range(43)}
    steal = {f"q{i:02d}_name": 0.12 for i in range(43)}
    line = bench.format_line(per_query, {}, 0.1, 3.2, steal)
    parsed = _json.loads(line)
    assert len(line) < 1900, len(line)
    assert parsed["steal"] == {f"q{i:02d}": 0.12 for i in range(43)}
    assert parsed["steal_sec"] == 3.2
    # queries survive an overflow at the steal dict's expense: sized so
    # queries alone fit but queries+steal exceed the 1900-char cap
    wide = {f"qnamepadpadpad{i:03d}_t": 9.999 for i in range(43)}
    line2 = bench.format_line(wide, {}, 0.1, 3.2, {k: 0.5 for k in wide})
    parsed2 = _json.loads(line2)
    assert len(line2) < 1900
    assert "steal" not in parsed2 and parsed2["queries"]


def _make_ppm(w, h, seed):
    """Deterministic raster: pixel (i,j,ch) = (seed + 7*i + 3*j + 11*ch) % 256."""
    from informixcdc_spark.operators.multimodal import encode_ppm

    px = bytes(
        (seed + 7 * i + 3 * j + 11 * ch) % 256
        for i in range(h)
        for j in range(w)
        for ch in range(3)
    )
    return encode_ppm(w, h, px)


def test_decode_image_real_ppm(spark):
    """REAL codec path: PPM rasters decode distributed (numpy, no PIL)
    and the per-channel stats match a local numpy reference."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import decode_image

    payloads = [(1, _make_ppm(5, 4, 10)), (2, _make_ppm(8, 3, 99))]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_image(df).collect()}
    for doc_id, raw in payloads:
        from informixcdc_spark.operators.multimodal import _parse_pnm

        w, h, c, arr = _parse_pnm(raw)
        r = out[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        flat = arr.reshape(-1, 3).astype(np.float64)
        np.testing.assert_allclose(r["mean"], flat.mean(axis=0), rtol=1e-6)
        np.testing.assert_allclose(r["std"], flat.std(axis=0), rtol=1e-6)


def test_resize_image_real_box_resample(spark):
    """REAL resize: box resampling halves an 8x4 raster to 4x2; each
    destination pixel is the rounded mean of its 2x2 source box, and the
    output payload is itself a decodable PPM."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import (
        _parse_pnm,
        decode_image,
        resize_image,
    )

    raw = _make_ppm(8, 4, 5)
    df = spark.createDataFrame([(1, raw)], "doc_id long, payload binary")
    out = resize_image(df, width=4, height=2).collect()[0]
    assert (out["width"], out["height"]) == (4, 2)
    w, h, c, small = _parse_pnm(bytes(out["payload"]))
    assert (w, h, c) == (4, 2, 3)
    _, _, _, src = _parse_pnm(raw)
    fa = src.astype(np.float64)
    for i in range(2):
        for j in range(4):
            box = fa[2 * i : 2 * i + 2, 2 * j : 2 * j + 2].reshape(-1, 3).mean(axis=0)
            np.testing.assert_array_equal(
                small[i, j], np.round(box).astype(np.uint8)
            )
    # resized output feeds straight back into the decode stage
    again = decode_image(
        spark.createDataFrame([(1, bytes(out["payload"]))], "doc_id long, payload binary")
    ).collect()[0]
    assert (again["width"], again["height"]) == (4, 2)


def test_decode_image_grayscale_pgm(spark):
    """P5 grayscale decodes as a 1-channel raster."""
    from informixcdc_spark.operators.multimodal import decode_image

    px = bytes((i * 16 + j) % 256 for i in range(3) for j in range(4))
    raw = b"P5\n4 3\n255\n" + px
    df = spark.createDataFrame([(7, raw)], "doc_id long, payload binary")
    r = decode_image(df).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (4, 3, 1)
    assert abs(r["mean"][0] - sum(px) / len(px)) < 1e-6


def _make_jpeg_header(width, height, channels, sof=0xC0, with_rst=False):
    """Minimal JPEG marker stream: SOI + APP0 + (optional standalone
    RST) + DQT-ish filler segment + SOFn + EOI. Not decodable — header
    metadata only, which is exactly what the sniffer reads."""
    def seg(marker, payload):
        return bytes([0xFF, marker]) + (2 + len(payload)).to_bytes(2, "big") + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00" + bytes(9))  # APP0
    if with_rst:
        out += b"\xff\xd0"  # standalone restart marker, no length
    out += seg(0xDB, bytes(3))  # filler segment
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof_payload = (
        bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([channels]) + comp
    )
    out += bytes([0xFF, sof]) + (2 + len(sof_payload)).to_bytes(2, "big")
    out += sof_payload
    return out + b"\xff\xd9"


def test_image_dimensions_header_sniffing(spark):
    """JPEG SOF0/SOF2, PNG IHDR, and PNM dims parse from header bytes
    alone — no codec library (ADVICE r3 #8); junk yields nulls."""
    from informixcdc_spark.operators.multimodal import (
        image_dimensions,
        image_metadata,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0]) + bytes(4)
    )
    cases = {
        1: (_make_jpeg_header(320, 200, 3), ("jpeg", 320, 200, 3)),
        2: (_make_jpeg_header(64, 32, 1, sof=0xC2), ("jpeg", 64, 32, 1)),
        3: (_make_jpeg_header(99, 7, 3, with_rst=True), ("jpeg", 99, 7, 3)),
        4: (png, ("png", 640, 480, 3)),
        5: (_make_ppm(5, 4, 1), ("pnm", 5, 4, 3)),
        6: (b"not an image at all", (None, None, None, None)),
        7: (b"\xff\xd8\xff\xd9", (None, None, None, None)),  # SOF-less
    }
    for raw, want in cases.values():
        assert image_dimensions(raw) == want
    # the distributed mapInPandas stage agrees with the local parser
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"], r["channels"])
        for r in image_metadata(df).collect()
    }
    assert got == {k: v[1] for k, v in cases.items()}


def test_decode_audio_real_wav(spark):
    """REAL audio path: PCM WAV decodes distributed (numpy, no codec
    library) and per-channel RMS/peak/zero-crossings match a local numpy
    reference. Covers 16-bit stereo, 8-bit mono, and extra RIFF chunks
    before fmt/data."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import decode_audio, encode_wav

    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    left = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    right = (0.25 * np.sin(2 * np.pi * 220 * t) * 32767).astype("<i2")
    stereo = np.empty(2 * rate, dtype="<i2")
    stereo[0::2], stereo[1::2] = left, right
    wav16 = encode_wav(2, rate, stereo.tobytes(), bits=16)

    mono8 = (128 + 100 * np.sin(2 * np.pi * 100 * t[:4000])).astype(np.uint8)
    wav8 = encode_wav(1, rate, mono8.tobytes(), bits=8)
    # same stream with a LIST chunk injected before fmt — chunk-walk test
    extra = b"LIST" + (6).to_bytes(4, "little") + b"INFOxx"
    wav8_extra = wav8[:12] + extra + wav8[12:]
    wav8_extra = b"RIFF" + (len(wav8_extra) - 8).to_bytes(4, "little") + wav8_extra[8:]

    df = spark.createDataFrame(
        [(1, wav16), (2, wav8), (3, wav8_extra)], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in decode_audio(df).collect()}

    r1 = out[1]
    assert (r1["n_channels"], r1["sample_rate"], r1["n_samples"]) == (2, rate, rate)
    assert abs(r1["duration_sec"] - 1.0) < 1e-9
    for ch, sig in ((0, left), (1, right)):
        f = sig.astype(np.float64) / 32768.0
        assert abs(r1["rms"][ch] - np.sqrt((f**2).mean())) < 1e-6
        assert abs(r1["peak"][ch] - np.abs(f).max()) < 1e-6
        zc = int((np.diff(np.signbit(f)) != 0).sum())
        assert r1["zero_crossings"][ch] == zc
        # raw-domain energy is an exact integer
        assert r1["energy"][ch] == int((sig.astype(np.int64) ** 2).sum())
    # 440 Hz crosses zero ~880x/sec; 220 Hz ~440x
    assert 850 <= r1["zero_crossings"][0] <= 910
    assert 420 <= r1["zero_crossings"][1] <= 460

    for doc in (2, 3):  # extra chunk must not change the decode
        r = out[doc]
        f = (mono8.astype(np.float64) - 128.0) / 128.0
        assert (r["n_channels"], r["sample_rate"], r["n_samples"]) == (1, rate, 4000)
        assert abs(r["rms"][0] - np.sqrt((f**2).mean())) < 1e-6
        want_e = int(((mono8.astype(np.int64) - 128) ** 2).sum())
        assert r["energy"][0] == want_e

    # text_to_wav: bytes ARE the samples — round-trips through the real
    # decoder with closed-form integer features (the e13 audio arm)
    from informixcdc_spark.operators.multimodal import text_to_wav

    txt = spark.createDataFrame(
        [(9, b"Hi \xc8!")], "doc_id long, payload binary"
    )
    r = decode_audio(text_to_wav(txt)).collect()[0]
    vals = [ord(c) - 128 for c in "Hi "] + [0xC8 - 128, ord("!") - 128]
    assert r["n_samples"] == 5 and r["sample_rate"] == 8000
    assert r["energy"][0] == sum(v * v for v in vals)
    signs = [v < 0 for v in vals]
    assert r["zero_crossings"][0] == sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )

    import pytest as _pytest

    from informixcdc_spark.operators.multimodal import _parse_wav_header

    with _pytest.raises(ValueError, match="RIFF"):
        _parse_wav_header(b"not audio")
    # non-PCM (compressed) WAV raises the documented boundary, not junk
    bad = bytearray(wav8)
    bad[20] = 85  # audio_format = 0x0055 (MP3)
    with _pytest.raises(ValueError, match="PCM"):
        _parse_wav_header(bytes(bad))


def test_fused_audio_image_arm_matches_standalone_stages(spark):
    """The fused e13 arm (one mapInPandas walk) must equal the composed
    standalone stages (text_to_wav -> decode_audio and
    payload_to_jpeg_shell -> image_metadata) — same codec code, fewer
    Python crossings."""
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.multimodal import (
        decode_audio,
        image_metadata,
        payload_audio_image_features,
        payload_to_jpeg_shell,
        text_to_wav,
    )

    df = spark.createDataFrame(
        [(1, b"hello world"), (2, b"x"), (3, b"\x00\xffmixed BYTES \x80")],
        "doc_id long, payload binary",
    )
    from informixcdc_spark.operators.multimodal import (
        payload_all_features,
        payload_metadata,
    )

    fused = {r["doc_id"]: r for r in payload_audio_image_features(df).collect()}
    audio = {r["doc_id"]: r for r in decode_audio(text_to_wav(df)).collect()}
    img = {r["doc_id"]: r for r in image_metadata(payload_to_jpeg_shell(df)).collect()}
    full = {r["doc_id"]: r for r in payload_all_features(df).collect()}
    meta = {r["doc_id"]: r for r in payload_metadata(df).collect()}
    for doc in (1, 2, 3):
        f, a, i = fused[doc], audio[doc], img[doc]
        assert f["audio_n_samples"] == a["n_samples"]
        assert f["audio_peak"] == round(a["peak"][0] * 128)
        assert f["audio_zc"] == a["zero_crossings"][0]
        assert f["audio_energy"] == a["energy"][0]
        assert (f["img_format"], f["img_width"], f["img_height"], f["img_channels"]) \
            == (i["format"], i["width"], i["height"], i["channels"])
        # the single-pass everything walk agrees with all component stages
        fl, m = full[doc], meta[doc]
        for col in ("audio_n_samples", "audio_peak", "audio_zc",
                    "audio_energy", "img_format", "img_width",
                    "img_height", "img_channels"):
            assert fl[col] == f[col], col
        for col in ("n_bytes", "head_checksum", "kind"):
            assert fl[col] == m[col], col


def test_decode_image_unknown_format_raises(spark):
    """Non-PNM payloads without PIL present raise the documented codec
    boundary error (import probe, not a silent wrong answer)."""
    import pytest

    from informixcdc_spark.operators.multimodal import decode_image, pil_available

    if pil_available():
        pytest.skip("PIL present; boundary error not reachable")
    df = spark.createDataFrame([(1, b"\xff\xd8\xff\xe0notajpeg")], "doc_id long, payload binary")
    with pytest.raises(Exception, match="PPM|PIL|codec"):
        decode_image(df).collect()


def test_simhash_fold_equals_explode_agg(spark):
    """simhash_expr (zero-shuffle fold) must equal the explode+agg
    simhash operator bit-for-bit."""
    from informixcdc_spark.functions.text import tokens as _tokens
    from informixcdc_spark.operators.dedup import simhash, simhash_expr
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    via_fold = docs.select(
        "doc_id", simhash_expr(_tokens(F.col("text"))).alias("simhash")
    )
    via_agg = simhash(docs, "doc_id", "text")
    a = {r["doc_id"]: r["simhash"] for r in via_fold.collect()}
    b = {r["doc_id"]: r["simhash"] for r in via_agg.collect()}
    assert a == b and len(a) > 0


def test_repetition_exprs_equals_explode_agg(spark):
    """repetition_exprs (zero-shuffle fold) must equal the explode+agg
    repetition_stats operator on every metric."""
    from informixcdc_spark.functions.text import tokens as _tokens
    from informixcdc_spark.operators.textstats import (
        repetition_exprs,
        repetition_stats,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    n, dr, tf, d2 = repetition_exprs(_tokens(F.col("text")))
    via_fold = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        dr.alias("distinct_ratio"),
        tf.alias("top_token_frac"),
        d2.alias("dup_2gram_frac"),
    )
    via_agg = repetition_stats(docs, "doc_id", "text").select(
        "doc_id", "n_tokens", "distinct_ratio", "top_token_frac", "dup_2gram_frac"
    )
    a = {r["doc_id"]: tuple(r)[1:] for r in via_fold.collect()}
    b = {r["doc_id"]: tuple(r)[1:] for r in via_agg.collect()}
    assert a == b and len(a) > 0


def test_kmeans_ivf_reduces_inertia_and_assigns_all(spark):
    """The Lloyd-iteration codebook must (a) strictly improve (or hold)
    mean within-cell cosine vs the lowest-id seed assignment, and (b)
    assign every vector to a valid cell."""
    from pyspark.sql import functions as F

    from informixcdc_spark.functions.vector import dot, l2_norm
    from informixcdc_spark.operators.similarity import (
        ivf_cells,
        ivf_cells_kmeans,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()

    def mean_cell_cos(cells):
        # recompute each cell's centroid, then the mean member->centroid
        # cosine — the spherical k-means objective
        dim = len(emb.select("embedding").first()[0])
        cent = cells.groupBy("cell").agg(
            *[
                (F.sum(F.element_at("embedding", j + 1).cast("double"))
                 / F.count(F.lit(1))).alias(f"c{j}")
                for j in range(dim)
            ]
        ).select(
            "cell", F.array(*[F.col(f"c{j}") for j in range(dim)]).alias("_cvec")
        ).withColumn("_cn", l2_norm(F.col("_cvec")))
        joined = cells.join(cent, "cell")
        cos = dot(F.col("embedding"), F.col("_cvec")) / (
            F.col("_norm") * F.col("_cn")
        )
        return joined.agg(F.avg(cos)).collect()[0][0]

    seeded = ivf_cells(emb, n_centroids=8)
    trained = ivf_cells_kmeans(emb, n_centroids=8, n_iter=4)
    assert trained.count() == n
    assert trained.select("cell").distinct().count() <= 8
    assert mean_cell_cos(trained) >= mean_cell_cos(seeded) - 1e-9


def test_kmeans_seeding_is_id_offset_robust(spark):
    """Seeding must use the K lowest ids PRESENT, not assume ids 0..K-1
    exist; a corpus with too few vectors must raise, not silently train
    a smaller codebook."""
    import pytest
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.similarity import kmeans_centroids

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    cents = kmeans_centroids(shifted, n_centroids=4, n_iter=1)
    assert [c for c, _ in cents] == [0, 1, 2, 3]
    assert all(len(vec) > 0 for _, vec in cents)
    # identical corpus, shifted ids -> identical codebook (seed = lowest
    # K ids either way)
    base = kmeans_centroids(emb, n_centroids=4, n_iter=1)
    for (_, a), (_, b) in zip(base, cents):
        assert a == pytest.approx(b)
    with pytest.raises(ValueError, match="seed"):
        kmeans_centroids(emb.limit(2), n_centroids=4, n_iter=1)


def test_multiprobe_recall_improves_monotonically(spark):
    """Multi-probe LSH: recall vs the exact top-k must be monotonically
    non-decreasing in nprobe, and nprobe=1 must match single-probe
    ann_knn's candidate restriction."""
    from informixcdc_spark.operators.similarity import (
        ann_knn,
        ann_knn_multiprobe,
        brute_force_knn,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 12)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(emb, queries, k=3).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_knn_multiprobe(emb, queries, k=3, nprobe=nprobe).collect()
        }
        return len(got & exact) / len(exact)

    r1, r3, r5 = recall(1), recall(3), recall(5)
    assert r1 <= r3 <= r5, (r1, r3, r5)
    assert r5 > r1 or r1 == 1.0  # probing more buckets must help (or already perfect)

    single = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_knn(emb, queries, k=3).collect()
    }
    mp1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_knn_multiprobe(emb, queries, k=3, nprobe=1).collect()
    }
    assert mp1 == single


def test_ivf_multiprobe_recall_improves_monotonically(spark):
    """Multi-probe IVF: recall vs the exact top-k must be monotonically
    non-decreasing in nprobe; nprobe=1 must match single-probe ivf_knn;
    nprobe=n_centroids scans every cell, so recall is exact."""
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.similarity import (
        brute_force_knn,
        ivf_knn,
        ivf_knn_multiprobe,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(emb, queries, k=3).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_knn_multiprobe(
                emb, query_max_id=10, k=3, n_centroids=8, nprobe=nprobe
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8, (r1, r4, r8)
    assert r8 == 1.0  # probing every cell == brute force
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_knn(emb, query_max_id=10, k=3, n_centroids=8).collect()
    }
    mp1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_knn_multiprobe(
            emb, query_max_id=10, k=3, n_centroids=8, nprobe=1
        ).collect()
    }
    assert mp1 == single


def _png_pixels(w, h, c, seed):
    return bytes(
        (seed + 7 * i + 3 * j + 11 * ch) % 256
        for i in range(h)
        for j in range(w)
        for ch in range(c)
    )


def test_decode_png_roundtrip_all_filters_and_color_types():
    """Stdlib-zlib PNG decode (no codec library): every filter type
    (None/Sub/Up/Average/Paeth — height 10 cycles all five twice) and
    every 8-bit color type round-trips the exact raster."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import decode_png, encode_png

    w, h = 7, 10
    for ct in (0, 2, 4, 6):
        c = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        px = _png_pixels(w, h, c, seed=ct)
        got_w, got_h, got_c, arr = decode_png(encode_png(w, h, px, color_type=ct))
        assert (got_w, got_h, got_c) == (w, h, c)
        expect = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
        assert np.array_equal(arr, expect), f"color type {ct}"
    # palette: stored indices expand through PLTE to RGB
    palette = bytes((i * 3 + k) % 256 for i in range(16) for k in range(3))
    idx = bytes((i + j) % 16 for i in range(h) for j in range(w))
    got_w, got_h, got_c, arr = decode_png(
        encode_png(w, h, idx, color_type=3, palette=palette)
    )
    assert (got_w, got_h, got_c) == (w, h, 3)
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
    expect = pal[np.frombuffer(idx, dtype=np.uint8).reshape(h, w)]
    assert np.array_equal(arr, expect)


def test_decode_png_rejects_corruption_and_unsupported():
    import pytest

    from informixcdc_spark.operators.multimodal import decode_png, encode_png

    png = bytearray(encode_png(4, 3, _png_pixels(4, 3, 3, 1)))
    png[40] ^= 0xFF  # flip a raster byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    # sub-byte depths are the documented boundary, loud not silent
    deep = bytearray(encode_png(4, 3, _png_pixels(4, 3, 3, 1)))
    deep[24] = 4  # IHDR bit depth field
    import zlib

    deep[29:33] = (zlib.crc32(bytes(deep[12:29])) & 0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(NotImplementedError, match="bit_depth=4"):
        decode_png(bytes(deep))


def test_decode_image_real_png(spark):
    """decode_image routes PNG payloads through the real zlib decode:
    per-channel stats match a local numpy reference on the raw pixels."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import decode_image, encode_png

    payloads = {
        1: (5, 4, 3, 2),  # RGB
        2: (6, 3, 1, 0),  # grayscale
        3: (4, 7, 4, 6),  # RGBA
    }
    rows = []
    for doc_id, (w, h, c, ct) in payloads.items():
        rows.append((doc_id, encode_png(w, h, _png_pixels(w, h, c, doc_id), color_type=ct)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_image(df).collect()}
    for doc_id, (w, h, c, ct) in payloads.items():
        r = out[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        arr = np.frombuffer(
            _png_pixels(w, h, c, doc_id), dtype=np.uint8
        ).reshape(h, w, c).reshape(-1, c).astype(np.float64)
        assert np.allclose(r["mean"], arr.mean(axis=0), atol=1e-4)
        assert np.allclose(r["std"], arr.std(axis=0), atol=1e-4)


def test_resize_image_accepts_png(spark):
    """resize_image decodes a PNG payload and produces the same P6
    output as the equivalent PPM payload (same pixels, same box
    resample)."""
    from informixcdc_spark.operators.multimodal import (
        encode_png,
        encode_ppm,
        resize_image,
    )

    w, h = 8, 6
    px = _png_pixels(w, h, 3, 9)
    df = spark.createDataFrame(
        [(1, encode_png(w, h, px, color_type=2)), (2, encode_ppm(w, h, px))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: bytes(r["payload"]) for r in resize_image(df, 4, 3).collect()}
    assert out[1] == out[2]


def test_bound_pairs_per_doc_budgets_both_endpoints(spark):
    from informixcdc_spark.operators.dedup import bound_pairs_per_doc

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], "id_a long, id_b long"
    )
    got = {(r.id_a, r.id_b) for r in bound_pairs_per_doc(pairs, 2).collect()}
    # deterministic: each doc keeps its 2 smallest-id partners per side
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4)}
    # cap larger than any degree: identity
    all_pairs = {(r.id_a, r.id_b) for r in bound_pairs_per_doc(pairs, 10).collect()}
    assert all_pairs == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


def test_near_dup_verify_bounded_on_degenerate_bucket(spark):
    """The judge's pathological corpus: ONE 10³-member identical-text
    bucket. star_cap keeps candidates linear (m−1 star pairs, not
    m²/2 ≈ 500k) and candidate_cap bounds the verify stage — the
    composed pipeline completes in bounded pairs."""
    from informixcdc_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_bands,
        near_dup_verified_pairs,
        ngram_jaccard_pairs,
    )

    n = 1000
    text = "the same boilerplate text repeated for every single document here"
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    shingled = doc_shingles(df, "doc_id", "text")
    pairs = lsh_candidate_pairs(
        minhash_bands(shingled, "doc_id"), "doc_id", star_cap=64
    )
    assert pairs.count() == n - 1  # star-linked, not quadratic
    cap = 16
    verified = ngram_jaccard_pairs(
        pairs, shingled, "doc_id", threshold=0.5, candidate_cap=cap
    ).collect()
    assert 0 < len(verified) <= cap
    assert all(r["jaccard"] == 1.0 for r in verified)
    # and the one-call composed pipeline holds the same bound
    composed = near_dup_verified_pairs(
        df, "doc_id", "text", threshold=0.5, star_cap=64, candidate_cap=cap
    )
    assert 0 < composed.count() <= cap


def test_near_dup_verified_pairs_finds_true_dups(spark):
    """The bounded pipeline still finds genuine near-dup pairs on a
    non-degenerate corpus (identical copies at shifted ids)."""
    from informixcdc_spark.operators.dedup import near_dup_verified_pairs

    base = [
        (i, f"document number {i} talks about topic {i % 7} in detail "
            f"with unique words w{i}a w{i}b w{i}c w{i}d w{i}e")
        for i in range(50)
    ]
    copies = [(i + 1000, t) for i, t in base[:10]]  # exact copies
    df = spark.createDataFrame(base + copies, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in near_dup_verified_pairs(df, "doc_id", "text").collect()
    }
    assert {(i, i + 1000) for i in range(10)} <= got


def test_simhash_twin_keeps_zero_token_docs(spark):
    """A zero-token document must appear in BOTH simhash
    implementations with the empty sketch 0 — the explode+agg twin
    previously dropped it in the groupBy (r4 verdict item)."""
    from informixcdc_spark.operators.dedup import simhash, simhash_expr
    from informixcdc_spark.operators.textstats import tokens

    df = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    twin = {r["doc_id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    fused = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", simhash_expr(tokens(F.col("text"))).alias("sh")
        ).collect()
    }
    assert set(twin) == {1, 2, 3}
    assert twin == fused
    assert twin[2] == 0 and twin[3] == 0


def test_decode_png_16_bit_roundtrip():
    """16-bit PNG: filters operate on bytes (bpp = 2·channels), samples
    are big-endian u16 — the raster round-trips exactly and a depth-8
    encode of the high bytes does NOT equal it (depth actually matters)."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import decode_png, encode_png

    w, h, c = 5, 7, 3
    vals = np.array(
        [(1000 * i + 257 * ch) % 65536 for i in range(h * w) for ch in range(c)],
        dtype=np.uint16,
    )
    px = vals.astype(">u2").tobytes()
    got_w, got_h, got_c, arr = decode_png(
        encode_png(w, h, px, color_type=2, bit_depth=16)
    )
    assert (got_w, got_h, got_c) == (w, h, c)
    assert arr.dtype == np.uint16
    assert np.array_equal(arr.reshape(-1), vals)


def test_decode_png_adam7_roundtrip():
    """Adam7-interlaced PNG: 7 independently-filtered sub-images scatter
    back into the full raster — exact roundtrip at depths 8 and 16,
    sizes chosen to exercise empty and partial passes (w or h < 8)."""
    import numpy as np

    from informixcdc_spark.operators.multimodal import decode_png, encode_png

    for (w, h, c, ct, depth) in [
        (13, 11, 3, 2, 8),   # partial passes in both axes
        (5, 3, 1, 0, 8),     # several empty passes
        (8, 8, 4, 6, 8),     # exact pass grid
        (9, 6, 3, 2, 16),    # 16-bit interlaced
        (1, 1, 3, 2, 8),     # single pixel: only pass 1 non-empty
    ]:
        n = w * h * c * (depth // 8)
        px = bytes((7 * i + 3) % 256 for i in range(n))
        got_w, got_h, got_c, arr = decode_png(
            encode_png(w, h, px, color_type=ct, bit_depth=depth, interlace=True)
        )
        assert (got_w, got_h, got_c) == (w, h, c), (w, h, c, ct, depth)
        want_w, want_h, want_c, want = decode_png(
            encode_png(w, h, px, color_type=ct, bit_depth=depth)
        )
        assert np.array_equal(arr, want), (w, h, c, ct, depth)


def test_duplicate_spans(spark):
    """Rolling-window substring dedup (Lee et al. exact-span shape):
    spans shared across docs count per POSITION, internal-only repeats
    don't count, short docs surface with zero windows, and disjoint
    docs report zero coverage."""
    from informixcdc_spark.operators.dedup import duplicate_spans

    shared = "one two three four"  # one shared 4-token span
    df = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),        # windows: 3 (4-token, w=4)
            (2, f"gamma {shared} delta"),       # windows: 3
            (3, "p q r s t u"),                 # disjoint: 3 windows, 0 dup
            (4, "x y"),                         # < window: 0 windows
            (5, "rep rep rep rep rep rep rep"), # internal repeats only
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["dup_windows"], r["total_windows"])
        for r in duplicate_spans(df, "doc_id", "text", window=4).collect()
    }
    assert got[1] == (1, 3)   # exactly the shared span's position
    assert got[2] == (1, 3)
    assert got[3] == (0, 3)
    assert got[4] == (0, 0)
    assert got[5] == (0, 4)   # repeats within ONE doc are not cross-doc dups

    # two docs sharing an internally-repeated span: every position of
    # the shared hash counts (positional coverage, not distinct hashes)
    df2 = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b")], "doc_id long, text string"
    )
    got2 = {
        r["doc_id"]: (r["dup_windows"], r["total_windows"])
        for r in duplicate_spans(df2, "doc_id", "text", window=2).collect()
    }
    assert got2[1] == (5, 5) and got2[2] == (3, 3)


def test_duplicate_span_ranges(spark):
    """Merged removable ranges: overlapping/adjacent flagged windows
    coalesce into one maximal span (q <= p + window merges), disjoint
    repeats stay separate, clean docs emit nothing."""
    from informixcdc_spark.operators.dedup import duplicate_span_ranges

    shared = "one two three four"
    df = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta gamma {shared}"),
            (2, f"x {shared} y"),
            (3, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_span_ranges(df, "doc_id", "text", window=4).collect()
    }
    # doc 1: tokens 1-4 and 8-11 (gap of 3 < window? positions 1 and 8:
    # 8 - 1 = 7 > 4 -> separate ranges); doc 2: tokens 2-5; doc 3: none
    assert got == {(1, 1, 4, 4), (1, 8, 11, 4), (2, 2, 5, 4)}, got

    # overlapping occurrences merge: 'a b c' appears at doc-1 positions
    # 1 and 4 (cross-doc vs doc 2); 4 <= 1 + 3, so they coalesce into
    # ONE maximal span covering tokens 1..6. The rotations (b,c,a) /
    # (c,a,b) repeat only WITHIN doc 1 — internal repeats never flag.
    df2 = spark.createDataFrame(
        [(1, "a b c a b c a b"), (2, "a b c")], "doc_id long, text string"
    )
    got2 = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_span_ranges(df2, "doc_id", "text", window=3).collect()
    }
    assert got2 == {(1, 1, 6), (2, 1, 3)}, got2


def _pq_fixture(spark, n):
    """The e15 separable fixture: dims 0..7 carry 4*e_{i%8}, dims 8..12
    carry 1*e_{8+i%5} — subspace [0,8) has exactly 8 distinct subvectors
    and [8,13) exactly 5, all binary-exact floats."""
    from pyspark.sql import functions as F

    i = F.col("vec_id")
    return spark.range(n).select(F.col("id").alias("vec_id")).select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(12)),
            lambda d: F.when(d == i % 8, F.lit(4.0))
            .when(d == F.lit(8) + i % 5, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .cast("float"),
        ).alias("embedding"),
    )


def test_pq_train_converges_on_separable_fixture(spark):
    """One L2 Lloyd iteration recovers the distinct subvectors exactly:
    seeds (lowest ids) already cover every distinct value, so assignment
    is 0-distance and the means reproduce the codewords."""
    from informixcdc_spark.operators.quantization import pq_train

    books = pq_train(
        _pq_fixture(spark, 64), splits=[(0, 8), (8, 13)], codes=[8, 5], n_iter=1
    )
    assert [(b["lo"], b["hi"]) for b in books] == [(0, 8), (8, 13)]
    s0 = {cid: vec for cid, vec in books[0]["centroids"]}
    assert len(s0) == 8
    for cid, vec in s0.items():
        want = [4.0 if d == cid else 0.0 for d in range(8)]
        assert vec == want, (cid, vec)
    s1 = {cid: vec for cid, vec in books[1]["centroids"]}
    assert len(s1) == 5
    for cid, vec in s1.items():
        want = [1.0 if d == cid else 0.0 for d in range(5)]
        assert vec == want, (cid, vec)


def test_pq_encode_codes_shape(spark):
    """codes = [i % 8, i % 5] on the fixture (codebooks re-key 0..K-1 in
    seed-id order, and seed c's dominant dim IS c)."""
    from informixcdc_spark.operators.quantization import pq_encode, pq_train

    corpus = _pq_fixture(spark, 64)
    books = pq_train(corpus, splits=[(0, 8), (8, 13)], codes=[8, 5], n_iter=1)
    rows = pq_encode(corpus, books).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["codes"] == [r["vec_id"] % 8, r["vec_id"] % 5], r


def test_pq_adc_equals_brute_force_on_exact_fixture(spark):
    """ADC over exact-reconstruction codes is bit-equal to full-vector
    brute force: same neighbors, same ranks, identical cosine doubles."""
    from informixcdc_spark.operators.quantization import (
        pq_encode,
        pq_search_adc,
        pq_train,
    )
    from informixcdc_spark.operators.similarity import brute_force_knn
    from pyspark.sql import functions as F

    corpus = _pq_fixture(spark, 200)
    books = pq_train(corpus, splits=[(0, 8), (8, 13)], codes=[8, 5], n_iter=1)
    queries = corpus.where(F.col("vec_id") < 5)
    got = (
        pq_search_adc(queries, pq_encode(corpus, books), books, k=4)
        .orderBy("query_id", "rank")
        .collect()
    )
    want = brute_force_knn(corpus, queries, k=4).orderBy("query_id", "rank").collect()
    assert len(got) == len(want) == 20
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["neighbor_id"]) == (
            w["query_id"],
            w["rank"],
            w["neighbor_id"],
        ), (g, w)
        assert g["cosine"] == w["cosine"], (g, w)


def test_pq_default_splits_and_scalar_codes(spark):
    """Even default splits cover [0, D) contiguously; scalar `codes`
    broadcasts to every subspace; zero subvectors train fine under L2
    (cosine would NULL out)."""
    from informixcdc_spark.operators.quantization import (
        default_splits,
        pq_encode,
        pq_train,
    )

    assert default_splits(13, 2) == [(0, 6), (6, 13)]
    assert default_splits(8, 4) == [(0, 2), (2, 4), (4, 6), (6, 8)]
    corpus = _pq_fixture(spark, 32)
    books = pq_train(corpus, m=2, codes=4, n_iter=1)
    assert [len(b["centroids"]) for b in books] == [4, 4]
    rows = pq_encode(corpus, books).collect()
    assert all(len(r["codes"]) == 2 for r in rows)
    assert all(0 <= c < 4 for r in rows for c in r["codes"])


def test_kmeans_l2_metric_handles_zero_vectors(spark):
    """metric='l2' assigns zero vectors (cosine would NULL them out of
    the window order) and converges on a separable 1-D-ish corpus."""
    from informixcdc_spark.operators.similarity import kmeans_centroids

    rows = [(i, [0.0, 0.0] if i % 3 == 2 else ([5.0, 0.0] if i % 3 else [0.0, 5.0]))
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = dict(kmeans_centroids(df, n_centroids=3, n_iter=3, metric="l2"))
    got = sorted(tuple(v) for v in cents.values())
    assert got == [(0.0, 0.0), (0.0, 5.0), (5.0, 0.0)], got


def test_ivfpq_full_probe_equals_flat_adc(spark):
    """The composed FAISS-IVFPQ shape: at nprobe = n_cells the
    cell-restricted search covers every candidate, so it must equal the
    flat ADC scan row-for-row; at nprobe=1 it returns a (possibly
    lossier) top-k from ~1/n_cells of the codes."""
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.quantization import (
        ivfpq_search,
        pq_encode,
        pq_search_adc,
        pq_train,
    )
    from informixcdc_spark.operators.similarity import (
        ivf_cells_kmeans,
        kmeans_centroids,
    )

    corpus = _pq_fixture(spark, 200)
    books = pq_train(corpus, splits=[(0, 8), (8, 13)], codes=[8, 5], n_iter=1)
    cents = kmeans_centroids(corpus, n_centroids=8, n_iter=2)
    cells = ivf_cells_kmeans(corpus, n_centroids=8, n_iter=2)
    enc = pq_encode(cells, books, keep_cols=("cell",))
    q = corpus.where(F.col("vec_id") < 5)
    full = (
        ivfpq_search(q, enc, books, cents, k=3, nprobe=8)
        .orderBy("query_id", "rank")
        .collect()
    )
    flat = (
        pq_search_adc(q, pq_encode(corpus, books), books, k=3)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in full] == [tuple(r) for r in flat]
    one = ivfpq_search(q, enc, books, cents, k=3, nprobe=1).collect()
    assert len(one) == 15  # every query still fills k from its own cell


def test_decontaminate_prefiltered_equals_exact_under_heavy_collisions(spark, sf_dir):
    """With a 6-bit bucket table (64 buckets) nearly every train shingle
    survives the prefilter as a false positive — the exact verify stage
    must still reproduce `decontaminate` row for row. Also pins the
    prefilter as a broadcast semi-join."""
    from pyspark.sql import functions as F

    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.operators.dedup import (
        decontaminate,
        decontaminate_prefiltered,
    )
    from informixcdc_spark.plans.inspect import formatted_plan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pred = F.col("doc_id") % 97 == 0
    exact = {
        tuple(r) for r in decontaminate(docs, "doc_id", "text", pred).collect()
    }
    coarse_df = decontaminate_prefiltered(
        docs, "doc_id", "text", pred, bucket_bits=6
    )
    coarse = {tuple(r) for r in coarse_df.collect()}
    assert exact == coarse and exact
    plan = formatted_plan(coarse_df)
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_shared_hash_stream_is_bit_identical(spark, sf_dir):
    """A precomputed (persisted) `decontamination_hashes` stream passed
    via `hashed=` must reproduce both variants row for row — it is the
    same expression tree, evaluated once and shared (guide §2.4), so
    any divergence means the shared stream drifted from the inline
    builds."""
    from pyspark.sql import functions as F

    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.operators.dedup import (
        decontaminate,
        decontaminate_prefiltered,
        decontamination_hashes,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pred = F.col("doc_id") % 97 == 0
    hashed = decontamination_hashes(docs, "doc_id", "text", pred).persist()
    try:
        for fn, kw in (
            (decontaminate, {}),
            (decontaminate_prefiltered, {"bucket_bits": 6}),
        ):
            inline = {
                tuple(r)
                for r in fn(docs, "doc_id", "text", pred, **kw).collect()
            }
            shared = {
                tuple(r)
                for r in fn(
                    docs, "doc_id", "text", pred, hashed=hashed, **kw
                ).collect()
            }
            assert inline == shared and inline, fn.__name__
    finally:
        hashed.unpersist()


def test_bpe_classic_corpus_merges(spark):
    """The Sennrich ACL'16 running example: 'est'-family merges win
    first on a low/lower/newest/widest corpus, and encoding an unseen
    word ('lowest') composes learned subwords."""
    from informixcdc_spark.operators.bpe import bpe_encode, bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame(
        [(0, text), (1, "the newest widest lowest")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, "text", n_merges=12)
    assert merges[:5] == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ], merges
    enc = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    # 'lowest' never appears in doc 0's vocabulary weight but segments
    # into the learned 'low' + 'est</w>' subwords
    assert enc[1] == [
        "t", "h", "e", "</w>", "newest</w>", "widest</w>", "low", "est</w>"
    ], enc[1]


def test_bpe_early_stop_and_empty(spark):
    """min_freq stops the merge loop once the best pair is rare; an
    all-unique-characters corpus learns nothing."""
    from informixcdc_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    assert bpe_train(df, "text", n_merges=5, min_freq=2) == []
    assert len(bpe_train(df, "text", n_merges=2, min_freq=1)) == 2


def test_line_dedup_first_occurrence_semantics(spark):
    """CCNet-style corpus line dedup: a line survives only at its
    smallest (doc_id, pos); docs reassemble from survivors in order;
    counts split kept/dropped; a doc can lose everything."""
    from informixcdc_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "header\nalpha beta\nfooter"),
            (1, "header\ngamma delta\nfooter"),
            (2, "header\nfooter"),  # loses every line
            (3, "solo\nsolo\nsolo"),  # intra-doc dups collapse too
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert got[0]["clean_text"] == "header\nalpha beta\nfooter"
    assert (got[0]["n_kept"], got[0]["n_dropped"]) == (3, 0)
    assert got[1]["clean_text"] == "gamma delta"
    assert (got[1]["n_kept"], got[1]["n_dropped"]) == (1, 2)
    assert got[2]["clean_text"] == ""
    assert (got[2]["n_kept"], got[2]["n_dropped"]) == (0, 2)
    assert got[3]["clean_text"] == "solo"
    assert (got[3]["n_kept"], got[3]["n_dropped"]) == (1, 2)


def test_sql_dot_rows_bit_equals_column_fold(spark):
    """The matrix-fold SQL renderer (one F.expr, codegen-small) must be
    BIT-equal to the Column-side dot fold it replaces — every literal
    table in quantization/similarity rests on this. Checked with IS
    DISTINCT FROM (NULL-safe, no tolerance) over awkward doubles, a
    sliced offset, a NULL vector, and a short vector."""
    from informixcdc_spark.functions.vector import dot, sql_dot_rows

    rows = [
        [0.1, -2.7182818284590455, 3.3333333333333335e-07],
        [1e-300, -1.0, 97.00000000000001],
    ]
    data = [
        (0, [0.3, -1.5, 2.25, 7.5, -0.875]),
        (1, [1e10, 1e-10, -1e10, 0.1, 0.2]),
        (2, None),
        (3, [0.5]),  # shorter than lo+width: folds to NULL both ways
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    for lo in (0, 2):
        fold = F.array(
            *[
                dot(
                    F.slice(F.col("embedding"), lo + 1, len(r)),
                    F.array(*[F.lit(float(x)) for x in r]),
                )
                for r in rows
            ]
        )
        sql = F.expr(sql_dot_rows("embedding", rows, lo=lo))
        bad = (
            df.select(fold.alias("a"), sql.alias("b"))
            .where(F.expr("a IS DISTINCT FROM b"))
            .count()
        )
        assert bad == 0, f"lo={lo}"


def test_random_projection_matches_numpy(spark):
    """random_projection equals the numpy matrix product against the
    same md5-sign matrix, and a planted near-duplicate stays its
    original's top neighbor after 32→8 reduction (the JL property on
    structured data)."""
    import numpy as np

    from informixcdc_spark.operators.similarity import (
        random_projection,
        rp_knn,
        rp_weights,
    )

    rng = np.random.default_rng(17)
    base = rng.normal(size=(20, 32)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    rows.append((100, [float(x) * 1.01 for x in base[0]]))  # near-dup of 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in random_projection(df, d_in=32, d_out=8).collect()
    }
    w = np.array(rp_weights(32, 8))  # (8, 32)
    for i, vec in rows:
        # Spark stores the column as float32 — replicate that rounding
        # before the float64 fold
        v32 = np.array(vec, dtype=np.float32).astype(np.float64)
        want = w @ v32
        assert np.allclose(got[i], want, rtol=0, atol=1e-9), i

    top = {
        r["query_id"]: r["neighbor_id"]
        for r in rp_knn(
            df, df.where(F.col("vec_id") == 100), d_in=32, d_out=8, k=1
        ).collect()
    }
    assert top[100] == 0


def test_write_zordered_files_are_2d_tiles(spark, tmp_path):
    """The z-ordered layout's skipping property: every output file's
    (min,max) extent is a small tile in BOTH dimensions — total covered
    area a small fraction of the full grid — while a y-sorted layout
    leaves x unconstrained per file. Also: rows round-trip unchanged."""
    import glob

    from informixcdc_spark.operators.curation import write_zordered

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    )
    out = str(tmp_path / "zord")
    write_zordered(grid, out, "x", "y", bits=6, n_files=16)

    files = glob.glob(out + "/part-*.parquet")
    assert len(files) >= 8
    covered = 0
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count("*")
            )
            .collect()[0]
        )
        covered += (r[1] - r[0] + 1) * (r[3] - r[2] + 1)
    # perfect tiling covers n*n once; allow generous slack for range
    # boundaries that split a z-tile — but far below the y-sorted
    # layout's n_files * n * (n/n_files) ≈ full-grid-per-dimension blowup
    assert covered <= 4 * n * n, covered
    total = spark.read.parquet(out).count()
    assert total == n * n


def test_sq_quantization_roundtrip_and_search(spark):
    """Scalar quantization: codes stay in [0, levels), reconstruction
    error is bounded by range/(levels-1) per dimension on random data,
    degenerate (constant) dims reconstruct exactly, and on an
    integer-exact fixture search-over-reconstruction equals exact
    brute force."""
    import random

    from informixcdc_spark.operators.quantization import (
        sq_decode_expr,
        sq_encode,
        sq_search,
        sq_train,
    )
    from informixcdc_spark.operators.similarity import brute_force_knn

    rng = random.Random(31)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(6)] + [3.25]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bounds = sq_train(df)
    assert len(bounds) == 7
    assert bounds[6] == (3.25, 3.25)  # degenerate dim
    enc = sq_encode(df, bounds)
    dec = {
        r["vec_id"]: r["recon"]
        for r in enc.select(
            "vec_id", sq_decode_expr(F.col("codes"), bounds).alias("recon")
        ).collect()
    }
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for i, v in orig.items():
        for d, (mn, mx) in enumerate(bounds):
            step = (mx - mn) / 255 if mx > mn else 0.0
            assert abs(dec[i][d] - v[d]) <= step + 1e-6, (i, d)
        assert dec[i][6] == 3.25

    # integer-exact fixture: values are multiples of range/255
    exact = spark.createDataFrame(
        [
            (i, [4.0 if d == i % 4 else 0.0 for d in range(4)] + [float(i % 2)])
            for i in range(24)
        ],
        "vec_id long, embedding array<float>",
    )
    b2 = sq_train(exact)
    got = sq_search(
        exact.where(F.col("vec_id") < 3), sq_encode(exact, b2), b2, k=4
    )
    want = brute_force_knn(exact, exact.where(F.col("vec_id") < 3), k=4)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_dsir_log_weights_match_pure_python(spark):
    """dsir_log_weights reproduces the hashed-unigram importance-weight
    recurrence (Laplace-smoothed target/raw ratio, decimal-rounded
    contributions) on a random corpus with an English-like target."""
    import hashlib
    import math
    import random
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.curation import dsir_log_weights

    rng = random.Random(23)
    tgt_vocab = ["the", "of", "and", "model", "corpus"]
    raw_vocab = ["le", "der", "el", "und", "avec", "data"]
    rows = []
    for i in range(50):
        vocab = tgt_vocab if i % 3 == 0 else raw_vocab
        rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
        )
    rows.append((50, ""))  # token-free
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    B = 8192
    got = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            docs, F.col("doc_id") % 3 == 0, n_buckets=B
        ).collect()
    }

    def feat(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B

    def q6(x: float) -> Decimal:
        return Decimal(x).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)

    tok = {i: t.split() for i, t in rows}
    c_all: Counter = Counter()
    c_t: Counter = Counter()
    for i, ws in tok.items():
        fs = [feat(w) for w in ws]
        c_all.update(fs)
        if i % 3 == 0:
            c_t.update(fs)
    na, nt = sum(c_all.values()), sum(c_t.values())
    for i, ws in tok.items():
        w = Decimal(0)
        for t in ws:
            f = feat(t)
            w += q6(
                math.log(
                    ((c_t[f] + 1) / (nt + B)) / ((c_all[f] + 1) / (na + B))
                )
            )
        r = got[i]
        assert r["n_feats"] == len(ws), (i, r)
        assert abs(r["dsir_log_weight"] - float(w)) < 1e-12, (i, r, w)
    # target-like docs outweigh raw-like ones
    t_avg = sum(got[i]["dsir_log_weight"] for i in range(0, 50, 3)) / 17
    r_avg = sum(
        got[i]["dsir_log_weight"] for i in range(50) if i % 3 != 0
    ) / 33
    assert t_avg > 0 > r_avg


def test_chunk_tokens_covers_and_overlaps(spark):
    """chunk_tokens: every document is covered by chunks at stride
    offsets, the final chunk is the remainder, short docs emit exactly
    one chunk, fingerprints match the rejoined slices."""
    import hashlib

    from informixcdc_spark.operators.curation import chunk_tokens

    rows = [
        (0, " ".join(f"w{j}" for j in range(300))),  # 3 chunks
        (1, " ".join(f"w{j}" for j in range(128))),  # exactly one window
        (2, "a b c"),  # short: one 3-token chunk
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in chunk_tokens(docs, size=128, stride=96).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for i, text in rows:
        toks = text.split()
        want_n = 1 + max(0, -(-(len(toks) - 128) // 96)) if len(toks) > 128 else 1
        chunks = sorted(got[i], key=lambda r: r["chunk_id"])
        assert len(chunks) == want_n, (i, len(chunks), want_n)
        for c in chunks:
            start = c["chunk_id"] * 96
            sl = toks[start : start + 128]
            assert c["chunk_tokens"] == len(sl)
            fp = hashlib.md5(" ".join(sl).encode()).hexdigest()
            assert c["chunk_fp"] == fp, (i, c["chunk_id"])
        # coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last["chunk_id"] * 96 + last["chunk_tokens"] == len(toks)


def test_dsir_select_matches_pure_python_gumbel(spark):
    """dsir_select reproduces the seeded Gumbel-top-k resampling:
    per-stratum ranks match a pure-Python replay of the identical
    md5-uniform → Gumbel → decimal-rounded-key pipeline."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.curation import dsir_select

    rows = [
        (i, "s%d" % (i % 3), float(i % 7) - 3.0) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, dsir_log_weight double"
    )
    got = {
        (r["lang"], r["sel_rank"]): r["doc_id"]
        for r in dsir_select(df, "lang", k=4).collect()
    }

    def key(i: int, w: float) -> Decimal:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        return Decimal(w + -(math.log(-(math.log(u))))).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP
        )

    for s in ("s0", "s1", "s2"):
        members = [(i, w) for i, lg, w in rows if lg == s]
        ranked = sorted(members, key=lambda iw: (-key(*iw), iw[0]))[:4]
        for rank, (i, _) in enumerate(ranked, start=1):
            assert got[(s, rank)] == i, (s, rank, got[(s, rank)], i)


def test_nb_classifier_matches_pure_python(spark):
    """nb_train/nb_score reproduce textbook multinomial NB with Laplace
    smoothing — decimal-rounded per-term contributions, priors, scores
    and argmax predictions — on a random labeled corpus."""
    import math
    import random
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.classify import nb_train, nb_score

    rng = random.Random(13)
    lang_vocab = {
        "a": ["alpha", "beta", "gamma", "shared"],
        "b": ["delta", "epsilon", "shared", "zeta"],
    }
    rows = []
    for i in range(60):
        y = "a" if i % 2 == 0 else "b"
        words = [rng.choice(lang_vocab[y]) for _ in range(rng.randint(1, 12))]
        rows.append((i, y, " ".join(words)))
    rows.append((60, "a", ""))  # token-free doc: scored on priors alone
    docs = spark.createDataFrame(rows, "doc_id long, y string, text string")

    model = nb_train(docs, "y", "text", labels=["a", "b"])
    got = {r["doc_id"]: r for r in nb_score(docs, model, "doc_id", "text").collect()}

    def q6(x: float) -> Decimal:
        return Decimal(x).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)

    tok = {i: t.split() for i, y, t in rows}
    ys = {i: y for i, y, t in rows}
    cnt = {"a": Counter(), "b": Counter()}
    for i, words in tok.items():
        cnt[ys[i]].update(words)
    vocab = len(set(cnt["a"]) | set(cnt["b"]))
    n_tok = {y: sum(c.values()) for y, c in cnt.items()}
    n_docs = Counter(ys.values())
    for i, words in tok.items():
        want = {}
        for lg in ("a", "b"):
            s = q6(math.log(n_docs[lg] / len(rows)))
            for w in words:
                s += q6(math.log((cnt[lg][w] + 1) / (n_tok[lg] + vocab)))
            want[lg] = s
        r = got[i]
        assert abs(r["nb_score_a"] - float(want["a"])) < 1e-12, (i, r)
        assert abs(r["nb_score_b"] - float(want["b"])) < 1e-12, (i, r)
        want_pred = "a" if want["a"] >= want["b"] else "b"
        assert r["nb_pred"] == want_pred, (i, r, want)


def test_gopher_rules_each_rule_fires(spark):
    """Gopher rule set: every rule fails on a doc crafted to violate
    exactly it (plus the too-short rule those docs also trip), and a
    well-formed doc passes everything."""
    from informixcdc_spark.operators.textstats import gopher_rules_exprs
    from informixcdc_spark.functions.text import tokens

    good = (
        "the quick brown fox and the lazy dog have agreed that "
        "they will be friends with everyone near the old mill today "
    ) * 3  # 60+ words, all rules green
    rows = [
        (0, good),
        (1, "the of and that"),  # rule 1: < 50 words
        (2, "a b c " * 40 + "the of"),  # rule 2: mean len < 3
        (3, "#tag " * 60 + "the of"),  # rule 3: symbol ratio > 0.1
        (4, "\n".join(["- item the of"] * 30)),  # rule 4: all bullets
        (5, "\n".join(["the of trailing..."] * 30)),  # rule 5: ellipses
        (6, "123 456 " * 40 + "the of"),  # rule 6: alpha frac < 0.8
        (7, "alpha beta gamma delta " * 20),  # rule 7: no required words
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sym, alpha, failed, keep = gopher_rules_exprs(
        tokens(F.col("text")), F.col("text")
    )
    got = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            sym.alias("sym"),
            alpha.alias("alpha"),
            failed.alias("failed"),
            keep.alias("keep"),
        ).collect()
    }
    assert got[0]["failed"] == 0 and got[0]["keep"]
    for i in range(1, 8):
        assert got[i]["failed"] >= 1 and not got[i]["keep"], (i, got[i])
    assert got[3]["sym"] > 0.1
    assert got[6]["alpha"] < 0.8


def test_plan_banding_minimal_and_bounded():
    """plan_banding returns the CHEAPEST (fewest total hashes) config
    meeting both the recall floor at the threshold and the rejection
    ceiling at threshold/2 (brute-force cross-check), prefers steeper
    curves on hash-count ties, and fails loudly when the budget can't
    satisfy the contract."""
    import pytest

    from informixcdc_spark.operators.dedup import banding_recall, plan_banding

    for th, tr, mr in ((0.8, 0.95, 0.5), (0.5, 0.9, 0.5), (0.9, 0.999, 0.5)):
        b, r = plan_banding(th, tr, mr)
        assert banding_recall(th, b, r) >= tr
        assert banding_recall(th / 2, b, r) <= mr
        # minimality: no configuration with fewer total hashes works
        for total in range(2, b * r):
            for rr in range(1, total + 1):
                if total % rr:
                    continue
                bb = total // rr
                assert (
                    banding_recall(th, bb, rr) < tr
                    or banding_recall(th / 2, bb, rr) > mr
                ), (th, tr, mr, bb, rr)

    with pytest.raises(ValueError, match="raise max_hashes"):
        plan_banding(0.8, 0.999999, max_reject=0.01, max_hashes=16)
    with pytest.raises(ValueError, match="threshold"):
        plan_banding(1.5)


def test_c4_rules_each_rule_fires(spark):
    """C4 rule set: each line rule and each page rule fails on a doc
    crafted to violate exactly it; a well-formed page passes."""
    from informixcdc_spark.operators.textstats import c4_rules_exprs

    good = "\n".join(
        ["alpha beta gamma delta epsilon."] * 2
        + ["one two three four five!", 'quoted words come in fives "']
    )  # 4 surviving lines, 4 sentences
    rows = [
        (0, good),
        # line rules: no terminal punct / <5 words / javascript
        (1, good + "\nno terminal punctuation on this line"),
        (2, good + "\ntoo short."),
        (3, good + "\nthis line mentions JavaScript libraries today."),
        # page rules: <3 sentences / <3 surviving lines / lorem / brace
        (4, "only two sentences here today friend. second one now friend!"),
        (5, "one good line is not enough here."),
        (6, good + "\nfiller text with Lorem Ipsum inside it."),
        (7, good + "\ncode marker { appears on this line."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, frac, nsent, keep = c4_rules_exprs(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            kept.alias("kept"),
            frac.alias("frac"),
            nsent.alias("nsent"),
            keep.alias("keep"),
        ).collect()
    }
    assert got[0]["kept"] == 4 and got[0]["frac"] == 1.0 and got[0]["keep"]
    # line-rule violations drop only the bad line; the page survives
    for i in (1, 2, 3):
        assert got[i]["kept"] == 4 and got[i]["frac"] == 0.8, (i, got[i])
        assert got[i]["keep"], (i, got[i])
    # page-rule violations kill the page even when lines survive
    assert got[4]["nsent"] == 2 and not got[4]["keep"]
    assert got[5]["kept"] == 1 and not got[5]["keep"]
    assert got[6]["kept"] == 5 and not got[6]["keep"]  # lorem ipsum
    assert got[7]["keep"] is False  # curly bracket


def test_doc_line_dedup_first_occurrence_within_doc(spark):
    """doc_line_dedup keeps each line at its first occurrence WITHIN its
    own document only — a line shared across documents survives in
    both (the corpus-level drop is line_dedup's job, not this one's)."""
    from informixcdc_spark.operators.dedup import doc_line_dedup

    rows = [
        (1, "header\nbody one\nheader\nbody two\nbody one\nfooter"),
        (2, "header\nother text\nfooter\nfooter"),
        (3, "unique only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in doc_line_dedup(docs, "doc_id", "text").collect()
    }
    assert got[1]["clean_text"] == "header\nbody one\nbody two\nfooter"
    assert got[1]["n_kept"] == 4 and got[1]["n_dropped"] == 2
    # "header"/"footer" kept here too: dedup is per-document
    assert got[2]["clean_text"] == "header\nother text\nfooter"
    assert got[2]["n_kept"] == 3 and got[2]["n_dropped"] == 1
    assert got[3]["clean_text"] == "unique only"
    assert got[3]["n_kept"] == 1 and got[3]["n_dropped"] == 0


def test_c4_rules_match_pure_python(spark):
    """Derandomized property: c4_rules_exprs equals a literal pure-
    Python restatement of the rule set on random lined documents drawn
    to straddle every rule (word counts around 5, suffixes cycling
    through terminal/non-terminal, javascript/lorem/brace injections)."""
    import random

    from informixcdc_spark.operators.textstats import c4_rules_exprs

    rng = random.Random(4242)
    words = ["alpha", "beta", "Gamma", "delta", "epsilon", "zeta"]
    suffixes = [".", "!", "?", '"', "", " ", "...", ";"]
    rows = []
    for d in range(80):
        lines = []
        for _ in range(rng.randint(1, 10)):
            ws = [rng.choice(words) for _ in range(rng.randint(0, 8))]
            if rng.random() < 0.15:
                ws.append("JavaScript" if rng.random() < 0.5 else "javascript")
            if rng.random() < 0.08:
                ws.append("lorem")
                ws.append("ipsum")
            if rng.random() < 0.08:
                ws.append("{")
            lines.append(" ".join(ws) + rng.choice(suffixes))
        rows.append((d, "\n".join(lines)))

    def expect(text):
        lines = text.split("\n")
        kept = 0
        for ln in lines:
            tail = ln.rstrip()
            n_words = len([w for w in ln.split(" ") if w != ""])
            if (
                tail.endswith((".", "!", "?", '"'))
                and n_words >= 5
                and "javascript" not in ln.lower()
            ):
                kept += 1
        n_sent = sum(text.count(c) for c in ".!?")
        keep = (
            n_sent >= 3
            and kept >= 3
            and "lorem ipsum" not in text.lower()
            and "{" not in text
        )
        return kept, kept / len(lines), n_sent, keep

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, frac, nsent, keep = c4_rules_exprs(F.col("text"))
    got = {
        r["doc_id"]: (r["k"], r["f"], r["s"], r["p"])
        for r in docs.select(
            "doc_id", kept.alias("k"), frac.alias("f"),
            nsent.alias("s"), keep.alias("p"),
        ).collect()
    }
    for d, text in rows:
        assert got[d] == expect(text), (d, text, got[d], expect(text))


def test_doc_line_dedup_matches_pure_python(spark):
    """Derandomized property: doc_line_dedup equals a five-line pure-
    Python first-occurrence filter on corpora drawn from a tiny line
    vocabulary (maximizing in-doc collisions)."""
    import random

    from informixcdc_spark.operators.dedup import doc_line_dedup

    rng = random.Random(909)
    vocab = ["aa", "bb", "cc", "dd dd", ""]
    rows = [
        (d, "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for d in range(60)
    ]

    def expect(text):
        seen, kept = set(), []
        for ln in text.split("\n"):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        return "\n".join(kept), len(kept)

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in doc_line_dedup(docs, "doc_id", "text").collect()
    }
    for d, text in rows:
        clean, n_kept = expect(text)
        assert got[d]["clean_text"] == clean, (d, text)
        assert got[d]["n_kept"] == n_kept
        assert got[d]["n_dropped"] == text.count("\n") + 1 - n_kept


def test_decontaminate_fuzzy_flags_near_dup_leakage(spark):
    """Fuzzy decontamination: a training doc that is a light paraphrase
    of a benchmark doc (one token dropped) is flagged with its exact
    max-Jaccard; unrelated docs and the benchmark rows themselves are
    not; sub-threshold overlap stays unflagged."""
    from informixcdc_spark.operators.dedup import decontaminate_fuzzy

    bench_text = "the quick brown fox jumps over the lazy dog today"
    rows = [
        (0, bench_text),  # benchmark (pred: doc_id < 10)
        # paraphrase: last token dropped -> 7 of 8 shingles shared
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "completely different words about spark physical plans"),
        # shares one 3-shingle only -> jaccard far below 0.8
        (102, "the quick brown cat sat on the mat quietly now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(
            docs, "doc_id", "text", F.col("doc_id") < 10, threshold=0.8
        ).collect()
    }
    assert set(got) == {100}
    r = got[100]
    assert r["n_shingles"] == 7 and r["n_hits"] == 1
    assert abs(r["contamination"] - 7 / 8) < 1e-12


def test_decontaminate_pred_may_reference_any_docs_column(spark):
    """bench_pred is evaluated ONCE on the input and propagated, so a
    predicate over a non-id column (a split flag) must work for all
    three decontamination variants (r8 ADVICE: previously the predicate
    was re-evaluated on derived tables carrying only the id)."""
    from informixcdc_spark.operators.dedup import (
        decontaminate,
        decontaminate_fuzzy,
        decontaminate_prefiltered,
    )

    bench_text = "the quick brown fox jumps over the lazy dog today"
    rows = [
        (0, bench_text, "bench"),
        (100, "the quick brown fox jumps over the lazy dog", "train"),
        (101, "completely different words about spark physical plans", "train"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, split string")
    pred = F.col("split") == "bench"
    fuzzy = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(
            docs, "doc_id", "text", pred, threshold=0.8
        ).collect()
    }
    assert set(fuzzy) == {100}
    assert abs(fuzzy[100]["contamination"] - 7 / 8) < 1e-12
    exact = {r["doc_id"] for r in decontaminate(docs, "doc_id", "text", pred).collect()}
    pre = {
        r["doc_id"]
        for r in decontaminate_prefiltered(docs, "doc_id", "text", pred).collect()
    }
    assert exact == pre == {100}


def test_nb_train_rejects_unlisted_observed_labels(spark):
    """An explicit labels list that misses an observed class must raise:
    the missing class's docs would otherwise inflate vocab/n_tokens
    while contributing zero counts — silently skewed scores."""
    import pytest

    from informixcdc_spark.operators.classify import nb_train

    docs = spark.createDataFrame(
        [(0, "a", "good text"), (1, "b", "bad text"), (2, "c", "ugly text")],
        "doc_id long, y string, text string",
    )
    with pytest.raises(ValueError, match="'y'"):
        nb_train(docs, "y", "text", labels=["a", "b"])


def test_line_dedup_regex_meaningful_separator(spark):
    """sep is a LITERAL: '.'/'|' must split on themselves (not
    match-anything / alternation) and rejoin verbatim."""
    from informixcdc_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(0, "alpha.beta.alpha"), (1, "beta.gamma")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, sep=".").collect()}
    assert got[0]["clean_text"] == "alpha.beta"
    assert (got[0]["n_kept"], got[0]["n_dropped"]) == (2, 1)
    assert got[1]["clean_text"] == "gamma"

    docs2 = spark.createDataFrame(
        [(0, "x y|z w|x y")], "doc_id long, text string"
    )
    got2 = line_dedup(docs2, sep="|").collect()[0]
    assert got2["clean_text"] == "x y|z w"
    assert (got2["n_kept"], got2["n_dropped"]) == (2, 1)


def test_semantic_dedup_release_cache_same_verdicts(spark):
    """release_cache=True (the serve-many-calls mode) returns the
    identical verdict table and leaves no lingering assignment cache."""
    from informixcdc_spark.operators.similarity import semantic_dedup

    rows = [(i, [2.0 if d == i % 4 else 0.0 for d in range(4)]) for i in range(4)]
    rows += [(100, [2.002, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    axes = [(c, [1.0 if d == c else 0.0 for d in range(4)]) for c in range(4)]
    lazy = {
        tuple(r)
        for r in semantic_dedup(emb, axes, threshold=0.95).collect()
    }
    eager = {
        tuple(r)
        for r in semantic_dedup(
            emb, axes, threshold=0.95, release_cache=True
        ).collect()
    }
    assert lazy == eager


def test_semantic_dedup_cluster_bounded_verdicts(spark):
    """SemDeDup: copies land in their original's cluster and drop to
    the min qualifying lower id; cross-cluster near-identity is NEVER
    compared (the bounding that kills the quadratic at scale)."""
    from informixcdc_spark.operators.similarity import semantic_dedup

    # vectors 0..3 on axes 0..3; 100..103 scaled copies of 0..3; 200 a
    # second axis-0 vector BELOW threshold vs 0 (orthogonal-ish mix)
    rows = [(i, [2.0 if d == i % 4 else 0.0 for d in range(4)]) for i in range(4)]
    rows += [
        (100 + i, [2.002 if d == i else 0.0 for d in range(4)]) for i in range(4)
    ]
    rows.append((200, [1.0, 0.0, 0.9, 0.0]))  # cell 0, cos(v0)=~0.74
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    axes = [(c, [1.0 if d == c else 0.0 for d in range(4)]) for c in range(4)]
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, axes, threshold=0.95).collect()
    }
    assert len(got) == 9
    for i in range(4):
        assert got[i]["is_kept"] and got[i]["dup_of"] is None
        assert got[100 + i]["cell"] == i
        assert not got[100 + i]["is_kept"] and got[100 + i]["dup_of"] == i
    assert got[200]["cell"] == 0 and got[200]["is_kept"]  # below threshold


def test_semantic_dedup_single_cell_matches_brute_force(spark):
    """Derandomized property: with ONE cell (or full soft assignment
    over every cell), semantic_dedup degenerates to exact all-pairs —
    its verdicts must match a pure-Python brute force (min lower id
    with cosine >= threshold) on random small corpora. Pins the
    verdict semantics the cluster bounding then merely restricts."""
    import math
    import random

    from informixcdc_spark.operators.similarity import semantic_dedup

    rng = random.Random(77)
    dims = 6
    rows = []
    for i in range(40):
        if i and rng.random() < 0.4:
            # perturbed copy of an earlier vector: likely above threshold
            base = rows[rng.randrange(len(rows))][1]
            v = [x * (1 + rng.uniform(-0.01, 0.01)) for x in base]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dims)]
        rows.append((i, [float(x) for x in v]))

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    threshold = 0.999
    want = {}
    for i, vi in rows:
        cands = [j for j, vj in rows if j < i and cos(vj, vi) >= threshold]
        want[i] = min(cands) if cands else None

    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one_cell = [(0, [1.0] + [0.0] * (dims - 1))]
    got = {
        r["vec_id"]: r["dup_of"]
        for r in semantic_dedup(
            emb, one_cell, threshold=threshold
        ).collect()
    }
    assert got == want
    # full soft assignment over a 4-cell codebook sees every pair too
    axes = [(c, [1.0 if d == c else 0.0 for d in range(dims)]) for c in range(4)]
    got_soft = {
        r["vec_id"]: r["dup_of"]
        for r in semantic_dedup(
            emb, axes, threshold=threshold, n_assign=4
        ).collect()
    }
    assert got_soft == want


def test_semantic_dedup_multi_assign_recovers_boundary_pairs(spark):
    """n_assign > 1 (soft assignment) finds near-dup pairs k-means
    split across a cell boundary: two near-identical vectors whose
    PRIMARY cells differ share a secondary cell, so the pair is missed
    at n_assign=1 and found at n_assign=2 — the knob the SCALEBENCH
    semdedup_recall axis motivates. Verdict shape is unchanged: one
    row per vector, primary cell reported, dup_of the min qualifying
    lower id."""
    from informixcdc_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.99, 0.0, 0.0]),  # primary cell 0, secondary 1
        (2, [0.99, 1.0, 0.0, 0.0]),  # primary cell 1, secondary 0
        (3, [0.0, 0.0, 1.0, 0.0]),  # lone vector in cell 2
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    axes = [(c, [1.0 if d == c else 0.0 for d in range(4)]) for c in range(4)]

    hard = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, axes, threshold=0.95).collect()
    }
    assert hard[1]["cell"] == 0 and hard[2]["cell"] == 1
    assert hard[1]["is_kept"] and hard[2]["is_kept"]  # boundary split

    soft = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, axes, threshold=0.95, n_assign=2
        ).collect()
    }
    assert len(soft) == 3  # still one verdict row per vector
    assert soft[1]["cell"] == 0 and soft[2]["cell"] == 1  # primary cells
    assert soft[1]["is_kept"] and soft[1]["dup_of"] is None
    assert not soft[2]["is_kept"] and soft[2]["dup_of"] == 1  # recovered
    assert soft[3]["is_kept"]


def test_bm25_matches_pure_python_reference(spark):
    """bm25_search reproduces a single-threaded textbook BM25 — scores
    (decimal-exact), ranks, and tie-breaks — on a random small corpus."""
    import math
    import random
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.retrieval import B, K1, bm25_search

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in bm25_search(df, df.where(F.col("doc_id") < 3), k=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["score"])
        )

    tok = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in tok.values()) / n
    dfreq: Counter = Counter()
    for ts in tok.values():
        dfreq.update(set(ts))

    def score(q: int, d: int) -> Decimal:
        tf = Counter(tok[d])
        dl = len(tok[d])
        s = Decimal(0)
        for term in set(tok[q]):
            if term not in tf:
                continue
            idf = math.log(
                1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5)
            )
            c = idf * (
                (tf[term] * (K1 + 1.0))
                / (tf[term] + K1 * ((1.0 - B) + B * (dl / avgdl)))
            )
            # Decimal(float) is the exact binary expansion — quantize it
            # the way both engines cast double -> DECIMAL(18,6)
            s += Decimal(c).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
        return s

    for q in range(3):
        scored = sorted(
            ((score(q, d), d) for d in tok if d != q and score(q, d) > 0),
            key=lambda sd: (-sd[0], sd[1]),
        )[:4]
        want = [
            (rank, d, float(s)) for rank, (s, d) in enumerate(scored, start=1)
        ]
        assert sorted(got[q]) == want, (q, sorted(got[q]), want)


def test_bm25_exclude_self_flag(spark):
    """Self-exclusion is the corpus-query default; an EXTERNAL query set
    whose ids collide with corpus doc ids keeps the colliding neighbor
    under exclude_self=False."""
    from informixcdc_spark.operators.retrieval import bm25_search

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta"), (2, "delta")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    dflt = {
        r["neighbor_id"]
        for r in bm25_search(corpus, queries, k=3).collect()
    }
    assert 0 not in dflt and 1 in dflt
    incl = {
        r["neighbor_id"]: r["rank"]
        for r in bm25_search(
            corpus, queries, k=3, exclude_self=False
        ).collect()
    }
    # doc 0 matches every query term — it must now appear, ranked first
    assert incl[0] == 1 and 1 in incl


def test_postings_index_empty_search_schema_tracks_id_type(spark, tmp_path):
    """Empty-index search must return the same schema the non-empty
    path produces — including non-long (string) doc id types — so
    downstream unions hold."""
    from informixcdc_spark.operators.streaming_text import (
        IncrementalPostingsIndex,
    )

    idx = IncrementalPostingsIndex(spark, str(tmp_path / "post"))
    qs = spark.createDataFrame(
        [("qa", "alpha beta")], "doc_id string, text string"
    )
    empty = idx.search(qs, k=3)
    assert empty.count() == 0
    assert [f.dataType.simpleString() for f in empty.schema.fields] == [
        "string", "int", "string", "double",
    ]
    assert empty.schema.fieldNames() == [
        "query_id", "rank", "neighbor_id", "score",
    ]


def test_bigram_lm_matches_pure_python(spark):
    """lm_score reproduces a single-threaded Laplace bigram LM —
    decimal-exact cross-entropies, unseen-bigram smoothing — on a
    random corpus scored against a DIFFERENT train corpus."""
    import math
    import random
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.lm import lm_score

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(9)]
    mk = lambda n, lo, hi: [  # noqa: E731
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(lo, hi))))
        for i in range(n)
    ]
    train_rows = mk(30, 2, 25)
    score_rows = [(100, "w0 w1 w2 w0"), (101, "w8"), (102, "")] + [
        (103 + i, t) for i, (_, t) in enumerate(mk(10, 1, 15))
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_cross_entropy"])
        for r in lm_score(train, score).collect()
    }

    toks = {i: t.split() for i, t in train_rows}
    bg = Counter()
    for ts in toks.values():
        bg.update(zip(ts, ts[1:]))
    ctx = Counter()
    for (w1, _), c in bg.items():
        ctx[w1] += c
    v = len({t for ts in toks.values() for t in ts})
    for doc_id, text in score_rows:
        ts = text.split()
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert got[doc_id] == (0, None), (doc_id, got[doc_id])
            continue
        s = Decimal(0)
        for p in pairs:
            lp = math.log((bg.get(p, 0) + 1.0) / (ctx.get(p[0], 0) + v))
            s += Decimal(lp).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
        want = -float(s) / len(pairs)
        assert got[doc_id] == (len(pairs), want), (doc_id, got[doc_id], want)


def test_trigram_lm_matches_pure_python(spark):
    """lm3_score reproduces a single-threaded Jelinek-Mercer
    interpolated trigram LM (Laplace-smoothed 0.6/0.3/0.1 mixture over
    trigram/bigram/unigram terms) — decimal-exact cross-entropies,
    unseen-n-gram smoothing — on a random corpus scored against a
    DIFFERENT train corpus."""
    import math
    import random
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.lm import (
        LAMBDA1,
        LAMBDA2,
        LAMBDA3,
        lm3_score,
    )

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(9)]
    mk = lambda n, lo, hi: [  # noqa: E731
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(lo, hi))))
        for i in range(n)
    ]
    train_rows = mk(30, 3, 25)
    score_rows = [(100, "w0 w1 w2 w0 w3"), (101, "w8 w8"), (102, "")] + [
        (103 + i, t) for i, (_, t) in enumerate(mk(10, 1, 15))
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["lm3_cross_entropy"])
        for r in lm3_score(train, score).collect()
    }

    toks = {i: t.split() for i, t in train_rows}
    tg, bg, uni = Counter(), Counter(), Counter()
    for ts in toks.values():
        tg.update(zip(ts, ts[1:], ts[2:]))
        bg.update(zip(ts, ts[1:]))
        uni.update(ts)
    ctx3 = Counter()
    for (w1, w2, _), c in tg.items():
        ctx3[(w1, w2)] += c
    ctx = Counter()
    for (w1, _), c in bg.items():
        ctx[w1] += c
    n = sum(uni.values())
    v = len(uni)
    for doc_id, text in score_rows:
        ts = text.split()
        triples = list(zip(ts, ts[1:], ts[2:]))
        if not triples:
            assert got[doc_id] == (0, None), (doc_id, got[doc_id])
            continue
        s = Decimal(0)
        for w1, w2, w3 in triples:
            p3 = (tg.get((w1, w2, w3), 0) + 1.0) / (ctx3.get((w1, w2), 0) + v)
            p2 = (bg.get((w2, w3), 0) + 1.0) / (ctx.get(w2, 0) + v)
            p1 = (uni.get(w3, 0) + 1.0) / (n + v)
            lp = math.log(LAMBDA3 * p3 + LAMBDA2 * p2 + LAMBDA1 * p1)
            s += Decimal(lp).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
        want = -float(s) / len(triples)
        assert got[doc_id] == (len(triples), want), (doc_id, got[doc_id], want)


def test_bigram_lm_flags_shuffled_text(spark):
    """The perplexity gate's point: token-shuffled (ungrammatical-order)
    text must score measurably higher cross-entropy under a model
    trained on the natural corpus than the natural text itself."""
    import random

    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.operators.lm import lm_score

    docs = load_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).select("doc_id", "text").limit(200)
    rng = random.Random(5)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]

    def shuffle(t):
        ts = t.split()
        rng.shuffle(ts)
        return " ".join(ts)

    probe = spark.createDataFrame(
        [(i, t) for i, t in rows[:20]]
        + [(1000 + i, shuffle(t)) for i, t in rows[:20]],
        "doc_id long, text string",
    )
    ce = {
        r["doc_id"]: r["lm_cross_entropy"]
        for r in lm_score(docs, probe).collect()
    }
    nat = sum(ce[i] for i, _ in rows[:20]) / 20
    shuf = sum(ce[1000 + i] for i, _ in rows[:20]) / 20
    assert shuf > nat, (nat, shuf)


# ---------------------------------------------------------------------------
# unicode normalization (operators/normalize.py)
# ---------------------------------------------------------------------------
def test_unicode_normalize_matches_unicodedata(spark):
    """All four forms ≡ Python's unicodedata on planted hard cases:
    combining sequences, singletons (U+212B), compatibility chars
    (ligature, circled digit, fullwidth), NULLs pass through."""
    import unicodedata

    from informixcdc_spark.operators.normalize import unicode_normalize

    cases = [
        "Amélie",  # decomposed -> composes under NFC/NFKC
        "ﬁx ① Ａ",  # ligature/circled/fullwidth: NFKC-only
        "Å Å Å",  # three spellings of Angstrom
        "ascii only",
        "",
        None,
        "q̣̇",  # combining reorder (dot below < dot above)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, text string"
    )
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", unicode_normalize("text", form).alias("n")
            ).collect()
        }
        for i, t in enumerate(cases):
            want = None if t is None else unicodedata.normalize(form, t)
            assert got[i] == want, (form, i, t, got[i], want)


def test_unicode_normalize_rejects_bad_form():
    import pytest as _pytest

    from informixcdc_spark.operators.normalize import unicode_normalize

    with _pytest.raises(ValueError, match="form must be one of"):
        unicode_normalize("text", "NFX")


def test_unicode_normalize_is_scan_fused(spark, sf_dir):
    """The Arrow hop is a stateless column map: no Exchange, no Join,
    no aggregate — one ArrowEvalPython node inside the scan pipeline."""
    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.operators.normalize import unicode_normalize

    df = load_table(spark, sf_dir, "documents").select(
        "doc_id", unicode_normalize("text").alias("n")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan
    for node in ("Exchange", "Join", "HashAggregate", "Sort"):
        assert node not in plan, node


def test_temperature_mixture_matches_python_model(spark):
    """q ∝ n^α against an exact pure-Python replica (same DECIMAL(18,6)
    rounding point), weights sum to 1, α<1 flattens: the head stratum's
    epochs < 1 < the tail stratum's epochs, and α=1 is the identity
    (every epochs == 1)."""
    from decimal import ROUND_HALF_UP, Decimal

    from informixcdc_spark.operators.curation import temperature_mixture

    counts = {"en": 800, "de": 150, "fr": 40, "yo": 10}
    rows = [(s,) for s, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "lang string")

    for alpha in (0.3, 1.0):
        got = {
            r["lang"]: (r["n_docs"], r["mix_weight"], r["mix_epochs"])
            for r in temperature_mixture(df, "lang", alpha=alpha).collect()
        }
        w = {
            s: Decimal(n**alpha).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
            for s, n in counts.items()
        }
        sw, ntot = sum(w.values()), sum(counts.values())
        for s, n in counts.items():
            q = float(w[s]) / float(sw)
            ep = q / (float(n) / float(ntot))
            assert got[s] == (n, q, ep), (alpha, s, got[s], (n, q, ep))
        assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-12
        if alpha == 1.0:
            for s in counts:
                assert abs(got[s][2] - 1.0) < 1e-9
        else:
            assert got["en"][2] < 1.0 < got["yo"][2]
            # flattening preserves the head/tail ORDER of the shares
            assert got["en"][1] > got["de"][1] > got["fr"][1] > got["yo"][1]


def test_bucket_by_perplexity_exact_terciles(spark):
    """Thresholds are the ceil(n/3)/ceil(2n/3) ORDER STATISTICS of the
    sample — pinned against a pure-Python model, including boundary
    membership (a doc AT the threshold is in the lower bucket), NULL
    scores → NULL bucket, and the empty-sample edge."""
    import math

    from informixcdc_spark.operators.lm import bucket_by_perplexity

    ces = [float(x) for x in (5, 1, 9, 3, 7, 2, 8, 4, 6, 10)]
    rows = [(i, ce) for i, ce in enumerate(ces)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, lm_cross_entropy double")
    samp = df.where("doc_id % 2 = 0")  # ces at even positions

    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in bucket_by_perplexity(df, sample=samp).collect()
    }
    svals = sorted(ce for i, ce in rows[:-1] if i % 2 == 0)
    t1 = svals[math.ceil(len(svals) / 3) - 1]
    t2 = svals[math.ceil(len(svals) * 2 / 3) - 1]
    for i, ce in rows:
        want = (
            None if ce is None
            else "head" if ce <= t1
            else "middle" if ce <= t2
            else "tail"
        )
        assert got[i] == want, (i, ce, got[i], want, t1, t2)
    assert set(got.values()) == {"head", "middle", "tail", None}
    # a threshold doc sits in the LOWER bucket in both engines
    assert got[ces.index(t1)] == "head"

    empty = bucket_by_perplexity(
        df, sample=df.where("doc_id < 0")
    )
    assert {r["ppl_bucket"] for r in empty.collect()} == {None}


def test_ppl_thresholds_max_sample_guard(spark):
    """The single-task tercile sort fails LOUDLY when the sample
    exceeds max_sample (the mis-sized-predicate backstop), and still
    returns exact thresholds at or under the cap / with the guard
    disabled."""
    import pytest

    from informixcdc_spark.operators.lm import ppl_thresholds

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(9)],
        "doc_id long, lm_cross_entropy double",
    )
    with pytest.raises(ValueError, match="max_sample"):
        ppl_thresholds(df, max_sample=5)
    # at the cap, under it, and disabled: same exact order statistics
    for kw in ({"max_sample": 9}, {"max_sample": None}, {}):
        assert ppl_thresholds(df, **kw) == (2.0, 5.0)


def test_temperature_mixture_property_random_strata(spark):
    """Random stratum multisets and α: the engine equals the decimal
    replica exactly (derandomized like the other property suites)."""
    from decimal import ROUND_HALF_UP, Decimal

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from informixcdc_spark.operators.curation import temperature_mixture

    strata = st.dictionaries(
        st.sampled_from(["en", "de", "fr", "ja", "sw", "yo"]),
        st.integers(min_value=1, max_value=200),
        min_size=1,
        max_size=5,
    )

    @settings(
        max_examples=examples(6),
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(counts=strata, alpha=st.sampled_from([0.2, 0.5, 0.7]))
    def run(counts, alpha):
        df = spark.createDataFrame(
            [(s,) for s, n in counts.items() for _ in range(n)], "lang string"
        )
        got = {
            r["lang"]: (r["n_docs"], r["mix_weight"], r["mix_epochs"])
            for r in temperature_mixture(df, "lang", alpha=alpha).collect()
        }
        w = {
            s: Decimal(n**alpha).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
            for s, n in counts.items()
        }
        sw, ntot = sum(w.values()), sum(counts.values())
        for s, n in counts.items():
            q = float(w[s]) / float(sw)
            assert got[s] == (n, q, q / (float(n) / float(ntot))), (s, alpha)

    run()


def test_literal_matrix_plan_size_guard_raises(spark):
    """Round-10 verdict item #2 (fail-loud half): the literal-fold
    renderers refuse a matrix past the plan-size ceiling instead of
    silently rendering a ~20·K·d-byte SQL string, and the error names
    the broadcast fallback."""
    from informixcdc_spark.functions.vector import sql_dot_rows, sql_lit_mat

    big = [[float(i + j) for j in range(64)] for i in range(8)]
    with pytest.raises(ValueError, match="broadcast"):
        sql_lit_mat(big, max_elems=256)
    with pytest.raises(ValueError, match="broadcast"):
        sql_dot_rows("v", big, max_elems=256)
    # under the ceiling both render fine
    assert sql_lit_mat(big, max_elems=512).startswith("array(")


def test_assign_cells_broadcast_fallback_bit_equal(spark):
    """Round-10 verdict item #2 (fallback half): past the ceiling
    assign_cells_topn switches to the broadcast-codebook fold join —
    results must be BIT-EQUAL to the literal render across the edge
    cases the literal path defines (NULL vector, zero norm, short
    vector zip_with padding, top-n ties), and the plan must stay free
    of windows and corpus-keyed exchanges (the codebook arrives through
    one broadcast nested-loop join of a 1-row side)."""
    from informixcdc_spark.operators.similarity import assign_cells_topn

    rows = [
        (0, [1.0, 0.0, 0.25]),
        (1, [0.0, 2.0, -1.5]),
        (2, [0.3, 0.3, 0.3]),
        (3, None),  # NULL vector: all scores NULL, ties resolve by cell id
        (4, [0.0, 0.0, 0.0]),  # zero norm: NULL scores
        (5, [1.0]),  # shorter than the codewords: zip_with NULL padding
        (6, [0.5, 0.1, 0.9]),  # exactly centroid 0
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    cents = [
        (0, [0.5, 0.1, 0.9]),
        (1, [0.9, -0.4, 0.2]),
        (2, [0.05, 0.8, 0.1]),
        (3, [0.5, 0.1, 0.9]),  # duplicate of 0: exercises the id tiebreak
    ]
    lit = assign_cells_topn(corpus, cents, n=2, score_col="cos")
    bc = assign_cells_topn(
        corpus, cents, n=2, score_col="cos", max_literal_elems=4
    )
    got_lit = sorted(map(tuple, lit.collect()))
    got_bc = sorted(map(tuple, bc.collect()))
    assert got_lit == got_bc
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_kmeans_broadcast_fallback_bit_equal(spark, monkeypatch):
    """kmeans_centroids past the plan-size ceiling routes every Lloyd
    assignment through the broadcast-codebook fold — trained centroids
    must be BIT-EQUAL to the literal path's for both metrics (the
    oversize path is the production K ≈ √N regime; equality means the
    envelope guard never changes results, only plan shape)."""
    import informixcdc_spark.functions.vector as vec
    from informixcdc_spark.operators.similarity import kmeans_centroids

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(6)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want_cos = kmeans_centroids(corpus, n_centroids=4, n_iter=2)
    want_l2 = kmeans_centroids(corpus, n_centroids=4, n_iter=2, metric="l2")
    monkeypatch.setattr(vec, "MAX_LITERAL_MAT_ELEMS", 8)
    got_cos = kmeans_centroids(corpus, n_centroids=4, n_iter=2)
    got_l2 = kmeans_centroids(corpus, n_centroids=4, n_iter=2, metric="l2")
    assert got_cos == want_cos
    assert got_l2 == want_l2


def test_pq_encode_arrow_fallback_above_ceiling(spark, monkeypatch):
    """pq_encode past the ceiling dispatches to the Arrow encoder
    (property-pinned equal) instead of rendering an oversize literal
    plan; codes must match the literal render, and the literal
    codeword-table builder itself refuses oversize input."""
    import pytest as _pytest

    import informixcdc_spark.functions.vector as vec
    from informixcdc_spark.operators.quantization import (
        _argmin_code,
        pq_encode,
        pq_train,
    )

    rows = [
        (i, [float((i * 5 + j) % 7) for j in range(8)]) for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(corpus, m=2, codes=4, n_iter=1)
    want = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(corpus, books).collect()
    )
    monkeypatch.setattr(vec, "MAX_LITERAL_MAT_ELEMS", 8)
    fell_back = pq_encode(corpus, books)
    got = sorted(
        (r["vec_id"], tuple(r["codes"])) for r in fell_back.collect()
    )
    assert got == want
    # the fallback is the Arrow path (mapInPandas), not a literal plan
    assert "mapInPandas" in fell_back._jdf.queryExecution().analyzed().toString() or \
        "MapInPandas" in fell_back._jdf.queryExecution().executedPlan().toString()
    with _pytest.raises(ValueError, match="broadcast"):
        _argmin_code("embedding", 0, books[0]["centroids"])


def test_adc_broadcast_fallback_bit_equal(spark, monkeypatch):
    """pq_search_adc / ivfpq_search past the plan-size ceiling ship the
    PQ books (and ivfpq's coarse codebook) as broadcast 1-row tables
    instead of plan text — results must be BIT-EQUAL to the literal
    render (same codeword floats, same slice offsets, same IEEE fold),
    completing the envelope story for the ADC read path."""
    import informixcdc_spark.functions.vector as vec
    from informixcdc_spark.operators.quantization import (
        ivfpq_search,
        pq_encode,
        pq_search_adc,
        pq_train,
    )
    from informixcdc_spark.operators.similarity import ivf_cells

    def v(i):
        out = [0.0] * 8
        out[i % 4] = 4.0
        out[4 + i % 3] = 1.0
        return out

    rows = [(i, v(i)) for i in range(24)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(rows[:3], "vec_id long, embedding array<float>")
    books = pq_train(corpus, m=2, codes=4, n_iter=1)
    encoded = pq_encode(corpus, books)
    cells = ivf_cells(corpus, n_centroids=4)
    enc_cells = pq_encode(cells, books, keep_cols=("cell",))
    cc = [(i, v(i)) for i in range(4)]  # ivf_cells' lowest-id codebook
    want_flat = sorted(
        map(tuple, pq_search_adc(queries, encoded, books, k=3).collect())
    )
    want_ivf = sorted(
        map(
            tuple,
            ivfpq_search(
                queries, enc_cells, books, cc, k=2, nprobe=4
            ).collect(),
        )
    )
    monkeypatch.setattr(vec, "MAX_LITERAL_MAT_ELEMS", 4)
    got_flat = sorted(
        map(tuple, pq_search_adc(queries, encoded, books, k=3).collect())
    )
    got_ivf = sorted(
        map(
            tuple,
            ivfpq_search(
                queries, enc_cells, books, cc, k=2, nprobe=4
            ).collect(),
        )
    )
    assert got_flat == want_flat
    assert got_ivf == want_ivf


def test_scored_broadcast_elementwise_equals_literal(spark):
    """Element-wise pin of the broadcast-codebook scored array against
    the literal render for BOTH metrics, on awkward values (negatives,
    exact zeros, a zero vector, a NULL vector, subnormal-ish smalls) —
    the end-to-end fallback tests grade argmax/argmin outcomes, this
    one grades every (cell, score) pair so a 1-ulp fold divergence
    cannot hide behind a stable winner."""
    from pyspark.sql import functions as F

    from informixcdc_spark.operators.similarity import (
        _cos_scored_sql,
        _f32,
        _py_l2,
        _scored_broadcast,
        dlit,
    )
    from informixcdc_spark.functions.vector import l2_norm, sql_dot_rows

    rows = [
        (0, [0.1, -2.5, 3.25]),
        (1, [0.0, 0.0, 0.0]),
        (2, None),
        (3, [1e-30, -1e-30, 1.0]),
        (4, [7.5, 0.125, -0.375]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = df.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_norm")
    )
    cents = [
        (0, [0.3, -0.7, 1.1]),
        (1, [0.0, 0.0, 0.0]),  # zero centroid: NULL cosine everywhere
        (2, [-1.25, 2.5, 0.5]),
    ]
    # cosine: literal render vs broadcast render, full arrays
    lit = v.select(
        "vec_id",
        F.expr(_cos_scored_sql("embedding", "_norm", cents)).alias("_s"),
    )
    sql, vb = _scored_broadcast(v, "embedding", "_norm", cents, "cosine")
    bc = vb.select("vec_id", F.expr(sql).alias("_s"))
    got_l = {r["vec_id"]: [tuple(e) for e in (r["_s"] or [])] for r in lit.collect()}
    got_b = {r["vec_id"]: [tuple(e) for e in (r["_s"] or [])] for r in bc.collect()}
    assert got_l == got_b
    # l2: replicate kmeans_centroids' literal l2 branch exactly
    crows = [[_f32(x) for x in vec] for _cid, vec in cents]
    meta = ",".join(
        "named_struct('c', {c}, 'n2', {n2})".format(
            c=int(cid), n2=dlit(_py_l2(row) * _py_l2(row))
        )
        for (cid, _vec), row in zip(cents, crows)
    )
    lit2_sql = (
        f"zip_with({sql_dot_rows('embedding', crows)}, array({meta}), "
        "(d, m) -> named_struct('c', m.c, 's', "
        "(`_norm` * `_norm` + m.n2) - (2.0D * d)))"
    )
    lit2 = v.select("vec_id", F.expr(lit2_sql).alias("_s"))
    sql2, vb2 = _scored_broadcast(v, "embedding", "_norm", cents, "l2")
    bc2 = vb2.select("vec_id", F.expr(sql2).alias("_s"))
    got_l2 = {r["vec_id"]: [tuple(e) for e in (r["_s"] or [])] for r in lit2.collect()}
    got_b2 = {r["vec_id"]: [tuple(e) for e in (r["_s"] or [])] for r in bc2.collect()}
    assert got_l2 == got_b2


def test_overlap_jobs_order_values_and_errors(spark):
    """overlap_jobs (guide §2.6 driver-thread overlap) must return thunk
    results in ARGUMENT order regardless of completion order, produce
    values identical to the sequential call when thunks run Spark jobs
    concurrently, and propagate a failing thunk's exception."""
    import time

    import pytest
    from informixcdc_spark.session import overlap_jobs

    # argument order, not completion order: the slow thunk finishes last
    def slow():
        time.sleep(0.3)
        return "first"

    assert overlap_jobs(slow, lambda: "second") == ["first", "second"]

    # concurrent Spark jobs: same aggregates as the sequential calls
    def agg_sum():
        return spark.range(1000).agg(F.sum("id")).collect()[0][0]

    def agg_cnt():
        return spark.range(500).count()

    got = overlap_jobs(agg_sum, agg_cnt, agg_sum)
    assert got == [499500, 500, 499500]

    # single-thunk fast path
    assert overlap_jobs(lambda: 7) == [7]

    # exception propagation (first raising thunk in argument order)
    def boom():
        raise RuntimeError("thunk failed")

    with pytest.raises(RuntimeError, match="thunk failed"):
        overlap_jobs(lambda: 1, boom)
