"""Benchmark harness — one JSON line to stdout.

Headline: end-to-end KG construction (synthetic Common-Crawl-style pages ->
extract -> triples -> link -> canonical edges) plus the other pipeline
families (graph construction from events, MinHash dedup, ANN top-k, text
profiling) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "triples": N, "triples_per_sec": X, "cpus": K}

Scaling-efficiency evidence (north rule, N vs 4N): run
``tools/bench_scaling.py`` which invokes this file at local[8] and
local[32] on the same input and writes BENCH/BASELINE.md numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _host_probe() -> float:
    """Fixed single-thread CPU calibration (3x 2000^2 float64 matmul):
    this sandbox's hypervisor shows 2-3x invisible run-to-run contention
    (load average stays ~1 while wall times triple), so every bench line
    carries the probe — readers normalize stage times across runs by it.
    Measured range on this box: ~1.5s (quiet) to ~3s (contended)."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((2000, 2000))
    t0 = time.monotonic()
    for _ in range(3):
        a = a @ a / 1e3
    return round(time.monotonic() - t0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    host_probe_s = _host_probe()

    from pyspark.sql import functions as F

    from sigraph_spark.session import build_session

    spark = build_session(
        app_name=f"sigraph-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm the python-worker pool + JIT before timing (standard practice:
    # on a long-lived cluster these costs amortize to zero)
    from sigraph_spark.operators.extract import strip_html_udf as _warm_udf

    warm = spark.range(0, cpus * 8, 1, cpus * 8).select(
        _warm_udf()(F.encode(F.lit("<p>warm</p>"), "UTF-8")).alias("t")
    )
    warm.select(F.sum(F.length("t"))).collect()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def timed(name: str, fn):
        # the sandbox host shows 2-3x run-to-run noise: keep the per-stage
        # MIN over `reps` repetitions (the least-noise estimate)
        best_t, out = None, None
        for _ in range(reps):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            if best_t is None or dt < best_t:
                best_t = dt
        timings[name] = round(best_t, 3)
        return out

    # --- headline: full KG pipeline over synthetic pages ---------------------
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=sf).localCheckpoint(eager=True)  # exclude gen cost

    def run_pipeline() -> int:
        docs = extract_pages(pages).select("url", "warc_ts", "text")
        triples = triples_from_docs(docs).localCheckpoint(eager=True)
        n_triples = triples.count()
        mapping = link_entities(triples)
        canon = canonicalize_triples(triples, mapping).join(
            docs.select("url", "warc_ts"), "url"
        )
        edges = (
            canon.groupBy(F.col("subj"), F.col("verb").alias("predicate"), F.col("obj"))
            .agg(F.max(F.struct("warc_ts", "url")).alias("_lw"), F.count(F.lit(1)).alias("weight"))
        )
        extras["edges"] = edges.count()
        return n_triples

    n_triples = timed("kg_pipeline", run_pipeline)
    extras["triples"] = n_triples
    extras["triples_per_sec"] = round(n_triples / timings["kg_pipeline"], 1)

    # --- KG fusion & ontology layer over the extracted triples ----------------
    from sigraph_spark.operators.fusion import (
        entity_summary, fuse_triples, inverse_predicates,
        predicate_subsumption,
    )
    from sigraph_spark.plans.postprocess import claim_source

    bench_triples = triples_from_docs(
        extract_pages(pages).select("url", "text")
    ).localCheckpoint(eager=True)

    def run_fusion() -> int:
        claims = bench_triples.select(
            F.col("actor").alias("subject"),
            F.col("verb").alias("predicate"),
            "object",
            claim_source("url", segments=5).alias("source"),
        )
        return (
            fuse_triples(claims, "subject", "predicate", "object", "source").count()
            + inverse_predicates(bench_triples).count()
            + predicate_subsumption(bench_triples).count()
            + entity_summary(bench_triples).count()
        )

    timed("kg_fusion", run_fusion)

    # --- graph construction from events --------------------------------------
    from sigraph_spark.sources.events_map import sigraph_events

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def run_graph() -> int:
        from sigraph_spark.operators.graph import (
            build_edges, build_nodes, build_rule_matches, build_traces,
            build_trace_contains, parse_events,
        )
        # checkpoint the parse once — the five table builds branch from it
        # (mirrors the s-stage checkpoint boundaries of the real pipeline)
        good, _ = parse_events(sigraph_events(events))
        good = good.localCheckpoint(eager=True)
        return (
            build_nodes(good).count() + build_edges(good).count()
            + build_traces(good).count() + build_trace_contains(good).count()
            + build_rule_matches(good).count()
        )

    timed("graph_construct", run_graph)

    # --- incremental delta-merge (the §1.3 re-upsert write path) --------------
    from sigraph_spark.operators.graph import (
        GraphTables, build_graph, merge_graph_tables,
    )

    ev_all = sigraph_events(events)
    parity = F.pmod(F.xxhash64("span_id"), F.lit(10))
    base = build_graph(ev_all.filter(parity < 9))
    base = GraphTables(**{
        f: getattr(base, f).localCheckpoint(eager=True)
        for f in ("nodes", "edges", "traces", "trace_contains", "trace_spans",
                  "rule_matches", "errors")
    })  # existing graph (90% of events) materialized OUTSIDE the timing
    delta_events = ev_all.filter(parity == 9).localCheckpoint(eager=True)

    def run_merge() -> int:
        m = merge_graph_tables(base, delta_events)
        return m.nodes.count() + m.edges.count() + m.traces.count()

    timed("graph_merge_delta", run_merge)

    # --- graph analytics: fixed-point PageRank over the event graph ----------
    from sigraph_spark.operators.graph import build_edges, parse_events
    from sigraph_spark.operators.pagerank import pagerank

    good_pr, _ = parse_events(sigraph_events(events))
    edges_pr = build_edges(good_pr).select("src", "dst").localCheckpoint(eager=True)

    timed("pagerank", lambda: pagerank(edges_pr).count())

    # --- graph analytics: BFS blast radius + k-core audit ---------------------
    from sigraph_spark.operators.graphalgo import kcore, shortest_paths

    seeds = spark.createDataFrame([("proc_0.exe@PROCESS",)], "node_id string")
    timed(
        "bfs_kcore",
        lambda: shortest_paths(edges_pr, seeds).count()
        + kcore(edges_pr, k=4).count(),
    )

    # --- KG -> training-data: node features + walk corpus --------------------
    from sigraph_spark.operators.graphalgo import node_features
    from sigraph_spark.operators.walks import random_walks, skipgram_pairs

    def run_analytics() -> int:
        nf = node_features(edges_pr).count()
        pairs = skipgram_pairs(random_walks(edges_pr, walks_per_node=2, length=4))
        return nf + pairs.count()

    timed("kg_analytics", run_analytics)

    # --- dedup over documents -------------------------------------------------
    from sigraph_spark.operators.dedup import (
        incremental_minhash_candidates, minhash_dedup, minhash_index,
        simhash_candidates,
    )

    docs_tbl = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    timed("dedup_minhash", lambda: minhash_dedup(docs_tbl).count())
    timed("dedup_simhash", lambda: simhash_candidates(docs_tbl, max_hamming=3).count())

    # incremental path: the stored corpus index is materialized OUTSIDE the
    # timing (production reads it from an Iceberg table); the timed work is
    # signing the 10% delta and probing the index — the per-snapshot cost
    idx = minhash_index(docs_tbl.filter(F.col("doc_id") % 10 != 0)).localCheckpoint(
        eager=True
    )
    delta_docs = docs_tbl.filter(F.col("doc_id") % 10 == 0)
    timed(
        "dedup_incremental",
        lambda: incremental_minhash_candidates(delta_docs, idx)[0].count(),
    )

    # --- ANN top-k --------------------------------------------------------------
    from sigraph_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("ann_bruteforce", lambda: brute_force_topk(emb, q, k=10).count())
    timed("ann_lsh", lambda: lsh_topk(emb, q, dim=64, k=10, bits=8).count())

    # --- ANN product quantization: train + encode + ADC search ------------------
    from sigraph_spark.operators.pq import pq_encode, pq_topk, pq_train_lloyd

    def run_pq() -> int:
        books = pq_train_lloyd(emb, m=8, k=8, iters=2)
        codes = pq_encode(emb, books).localCheckpoint(eager=True)
        return pq_topk(codes, books, q, k=10).count()

    timed("ann_pq", run_pq)

    # --- inverted index + index-backed retrieval --------------------------------
    from sigraph_spark.operators.index import (
        build_inverted_index, doc_norms, search_index,
    )

    def run_index() -> int:
        idx = build_inverted_index(docs_tbl, n_shards=max(cpus // 4, 4))
        n = idx.count()
        top = search_index(
            idx, doc_norms(docs_tbl), ["join", "hash", "vector"], mode="or", k=20
        )
        return n + top.count()

    timed("index_retrieval", run_index)

    # --- KG completion: structural link prediction ------------------------------
    from sigraph_spark.operators.graphalgo import link_prediction

    timed("kg_completion", lambda: link_prediction(edges_pr, min_cn=2).count())

    # --- KG embeddings: TransE exact-integer training ----------------------------
    from sigraph_spark.operators.transe import transe_train

    bench_facts = bench_triples.select(
        F.col("actor").alias("subj"),
        F.col("verb").alias("predicate"),
        F.col("object").alias("obj"),
    )
    timed(
        "kg_embedding",
        lambda: transe_train(bench_facts, dim=8, rounds=2).count(),
    )

    # --- community detection over the event graph --------------------------------
    from sigraph_spark.operators.graphalgo import communities_lpa

    timed("communities", lambda: communities_lpa(edges_pr, rounds=3).count())

    # --- distant supervision: KG facts -> relation-extraction training set -------
    from sigraph_spark.operators.distant import distant_supervision

    ds_docs = extract_pages(pages).select("url", "text").localCheckpoint(eager=True)
    timed(
        "distant_supervision",
        lambda: distant_supervision(ds_docs, bench_facts, id_col="url").count(),
    )

    # --- mergeable sketches: per-source HLL distinct + CMS heavy hitters ---------
    from sigraph_spark.operators.sketches import (
        cms_estimate, cms_sketch, hll_distinct,
    )

    def run_sketches() -> int:
        n = hll_distinct(docs_tbl, ["lang"], "text", p=12).count()
        n += hll_distinct(docs_tbl, ["source"], "doc_id", p=12).count()
        cms = cms_sketch(docs_tbl, "source", w=1024, d=4)
        n += cms_estimate(
            cms, docs_tbl.select("source"), "source", w=1024, d=4
        ).count()
        return n

    timed("sketches", run_sketches)

    # --- HyperBall: all-sources neighborhood function over the event graph -------
    from sigraph_spark.operators.graphalgo import hyperball

    timed("hyperball", lambda: hyperball(edges_pr, p=8, radii=3).count())

    # --- sessionization + z-order/hilbert layout over the raw events -------------
    from sigraph_spark.operators.layout import (
        cluster_by_zorder, int_bucket, with_hilbert_key,
    )
    from sigraph_spark.streaming.windows import sessionize

    def run_sessions_layout() -> int:
        n = sessionize(events, gap="5 minutes").count()
        mm = events.agg(
            F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
            F.min(F.unix_timestamp("ts")).alias("tmin"),
            F.max(F.unix_timestamp("ts")).alias("tmax"),
        ).collect()[0]
        ub = int_bucket(F.col("user_id"), mm.umin, mm.umax, 16)
        tb = int_bucket(F.unix_timestamp("ts"), mm.tmin, mm.tmax, 16)
        laid = cluster_by_zorder(events, [ub, tb], num_partitions=max(cpus, 8))
        hil = with_hilbert_key(
            events.select(ub.alias("xb"), tb.alias("yb")), "xb", "yb", 16
        )
        return n + laid.count() + hil.count()

    timed("sessions_layout", run_sessions_layout)

    # --- text profiling ---------------------------------------------------------
    from sigraph_spark.operators.textstats import text_profile

    timed("text_profile", lambda: text_profile(docs_tbl).count())

    # --- keyphrase mining (round 5: TextRank + RAKE + pronoun coref) ------------
    from sigraph_spark.operators.coref import pronoun_coref
    from sigraph_spark.operators.keyphrase import (rake_keywords,
                                                   textrank_sentences)

    def run_keyphrase() -> int:
        # derive sentence punctuation the way the gates do (the synthetic
        # corpus has none): 12-word chunks joined with '. '
        ws = F.filter(
            F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))),
                    r"\s+"),
            lambda x: x != "",
        )
        nch = F.ceil(F.size(ws) / F.lit(12)).cast("int")
        sent_arr = F.transform(
            F.sequence(F.lit(0), F.greatest(nch - 1, F.lit(0))),
            lambda k: F.array_join(F.slice(ws, k * 12 + 1, 12), " "),
        )
        derived = docs_tbl.select(
            "doc_id", F.array_join(sent_arr, ". ").alias("text")
        )
        n = textrank_sentences(derived, top_k=3).count()
        n += rake_keywords(docs_tbl, top_k=5).count()
        n += pronoun_coref(derived, window_sents=2).count()
        return n

    timed("keyphrase", run_keyphrase)

    # --- corpus curation (split/sample/redact/repetition/vocab/packing) ---------
    from sigraph_spark.operators.corpus import (
        dataset_split, pack_sequences, redact_pii, repetition_score,
        stratified_sample, vocab_topk,
    )

    def run_corpus() -> int:
        return (
            dataset_split(docs_tbl).count()
            + stratified_sample(docs_tbl, {"en": 200}, 500).count()
            + redact_pii(docs_tbl).count()
            + repetition_score(docs_tbl).count()
            + vocab_topk(docs_tbl).count()
            + pack_sequences(docs_tbl, ctx_len=2048).count()
        )

    timed("corpus_ops", run_corpus)

    # --- contamination + curation funnel ---------------------------------------
    from sigraph_spark.operators.contamination import decontaminate, dup_spans
    from sigraph_spark.operators.corpus import curation_funnel

    def run_contamination() -> int:
        ev = docs_tbl.filter(F.col("doc_id") % 37 == 0)
        tr = docs_tbl.filter(F.col("doc_id") % 37 != 0)
        return (
            decontaminate(tr, ev).count()
            + dup_spans(docs_tbl).count()
            + curation_funnel(docs_tbl).count()
        )

    timed("contamination", run_contamination)

    # --- webtext KG extraction family (tables / taxonomy / reuse / aliases) ----
    import __spark_entry__ as entrymod

    from sigraph_spark.operators.hearst import hearst_pairs, taxonomy_edges
    from sigraph_spark.operators.htmltables import table_triples
    from sigraph_spark.operators.jsonld import jsonld_triples, meta_triples
    from sigraph_spark.operators.microdata import microdata_triples
    from sigraph_spark.operators.dlfacts import dl_facts
    from sigraph_spark.operators.htmllists import list_items
    from sigraph_spark.operators.rdfa import rdfa_triples
    from sigraph_spark.operators.links import resolve_redirects
    from sigraph_spark.operators.textreuse import reuse_spans

    # repartition(cpus) before every checkpoint: the synthetic corpora
    # materialize with ~5 partitions at sf0.1 and a checkpoint partition
    # is one task — the CPU-bound extraction legs ran on 5 of 32 cores
    # (the same local-mode starvation quantified for the fused scan in
    # tools/bench_fusedscan.py; measured 1.7-2.2x on md/jsonld/reuse).
    # At crawl scale inputs arrive as thousands of parquet row groups.
    def ckpt(df):
        return df.repartition(cpus).localCheckpoint(True)

    table_pages = ckpt(entrymod._webtext_table_pages(spark, sf=sf))
    hearst_docs = ckpt(entrymod._hearst_corpus(spark, sf=sf))
    reuse_docs = ckpt(entrymod._webtext_reuse_docs(spark, sf=sf))
    alias_edges = ckpt(entrymod._webtext_alias_graph(spark, sf=sf))
    ld_pages = ckpt(entrymod._webtext_jsonld_pages(spark, sf=sf))
    md_pages = ckpt(entrymod._webtext_microdata_pages(spark, sf=sf))
    rd_pages = ckpt(entrymod._webtext_rdfa_pages(spark, sf=sf))
    li_pages = ckpt(entrymod._webtext_list_pages(spark, sf=sf))
    dl_pages = ckpt(entrymod._webtext_dl_pages(spark, sf=sf))

    def run_webtext() -> int:
        return (
            table_triples(table_pages).count()
            + taxonomy_edges(hearst_pairs(hearst_docs)).count()
            + reuse_spans(reuse_docs, k=5, min_run=3, max_gram_df=8).count()
            + resolve_redirects(alias_edges, max_steps=16).count()
            + jsonld_triples(ld_pages).count()
            + meta_triples(ld_pages).count()
            + microdata_triples(md_pages).count()
            + rdfa_triples(rd_pages).count()
            + list_items(li_pages).count()
            + dl_facts(dl_pages).count()
        )

    timed("webtext_kg", run_webtext)

    # --- webtext mining batch (quotes / abbrev / quantities / template /
    # pagination) over their sf-scaled planted corpora -------------------------
    from sigraph_spark.operators.abbrev import abbrev_pairs, alias_map
    from sigraph_spark.operators.pagination import (
        extract_next_links, page_chains, stitch_chains,
    )
    from sigraph_spark.operators.quantities import extract_quantities
    from sigraph_spark.operators.quotes import extract_quotes
    from sigraph_spark.operators.template import page_structure, template_clusters

    qt_docs = ckpt(entrymod._webtext_quote_docs(spark, sf=sf))
    ab_docs = ckpt(entrymod._webtext_abbrev_docs(spark, sf=sf))
    qn_docs = ckpt(entrymod._webtext_quantity_docs(spark, sf=sf))
    tp_pages = ckpt(entrymod._webtext_template_pages(spark, sf=sf))
    ch_pages = ckpt(entrymod._webtext_chain_pages(spark, sf=sf))

    def run_mining() -> int:
        chains = page_chains(extract_next_links(ch_pages))
        return (
            extract_quotes(qt_docs).count()
            + alias_map(abbrev_pairs(ab_docs)).count()
            + extract_quantities(qn_docs).count()
            + template_clusters(page_structure(tp_pages)).count()
            + stitch_chains(ch_pages.select("url", "text"), chains).count()
        )

    timed("webtext_mining", run_mining)

    # --- fused one-scan structured extraction over the COMBINED corpus --------
    # every channel planted in the SAME pages (the webtext plan's real
    # input shape); the stage times the single-scan composition the plan's
    # w0 stage runs — all seven html channels from one pass over html
    from jobs.run_webtext_kg import synthetic_webtext_pages
    from sigraph_spark.operators.fusedscan import fused_struct_claims

    # repartition(cpus) first: the combined corpus materializes with ~5
    # partitions at sf0.1, which starves a SINGLE-scan plan of parallelism
    # (each checkpoint partition = one task) while multi-branch plans
    # overlap branches across cores — a local-mode illusion, quantified in
    # tools/bench_fusedscan.py, that inverted this stage's wall time
    wk_pages = (
        synthetic_webtext_pages(spark, sf).repartition(cpus).localCheckpoint(True)
    )

    def run_fused_scan() -> int:
        return fused_struct_claims(wk_pages).count()

    timed("webtext_fused_scan", run_fused_scan)

    # --- sink rendering (Neo4j bulk CSV + OpenSearch _bulk NDJSON) --------------
    # inputs pre-materialized: the stage times the RENDER projections only
    from sigraph_spark.operators.graph import build_nodes
    from sigraph_spark.operators.neo4j_csv import nodes_csv, rels_csv
    from sigraph_spark.operators.opensearch_bulk import bulk_index_lines

    bnodes = build_nodes(good_pr).localCheckpoint(eager=True)
    edges_full = build_edges(good_pr).localCheckpoint(eager=True)
    sev = ev_all.localCheckpoint(eager=True)

    def _drain(df) -> int:
        # force every output byte to materialize (sum of line lengths)
        return int(df.agg(F.sum(F.length("line"))).collect()[0][0])

    def run_sinks() -> int:
        return (
            _drain(nodes_csv(bnodes))
            + _drain(rels_csv(edges_full))
            + _drain(bulk_index_lines(sev))
        )

    timed("sink_render", run_sinks)

    # --- media metadata plane (round 5): header-walk sniffing throughput ------
    # payload corpus generated once inside mapInPandas (excluded from the
    # timing via localCheckpoint, like every other stage input); the stage
    # times the four no-decode walks over mixed real-format payloads.
    import pandas as _pd

    n_media = max(2000, int(120_000 * sf))

    def _gen_media_batch(batches):
        from sigraph_spark.operators.mediameta import (
            encode_avif_skeleton, encode_flac_skeleton,
            encode_ico_skeleton, encode_ogg_skeleton,
            encode_tiff_skeleton, encode_webp_skeleton,
        )
        from sigraph_spark.operators.mediatags import (
            encode_flac_with_comments, encode_id3v2,
        )
        from sigraph_spark.operators.multimodal import (
            encode_bmp, encode_gif, encode_mkv, encode_mp4, encode_png,
        )

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                k = i % 12
                if k == 0:
                    p = encode_webp_skeleton(100 + i % 500, 80, "vp8")
                elif k == 1:
                    p = encode_tiff_skeleton(64 + i % 100, 48,
                                             big_endian=(i % 2 == 0))
                elif k == 2:
                    p = encode_avif_skeleton(200 + i % 300, 150)
                elif k == 3:
                    p = (f'<svg width="{i % 900 + 1}" height="40">'
                         f'</svg>').encode()
                elif k == 4:
                    p = encode_ico_skeleton([(16, 16, 8), (48, 48, 32)])
                elif k == 5:
                    p = encode_png(12, 9, bytes(12 * 9 * 3))
                elif k == 6:
                    p = encode_gif(10, 8, bytes(10 * 8 * 3))
                elif k == 7:
                    p = encode_bmp(11, 7, bytes(11 * 7 * 3))
                elif k == 8:
                    p = encode_flac_skeleton(44100, 2, 16, 44100 + i)
                elif k == 9:
                    p = encode_ogg_skeleton(
                        "opus" if i % 2 else "vorbis", 48000, 2, 4800 + i)
                elif k == 10:
                    p = (encode_mp4(1000, 1000 + i % 9000,
                                    [{"handler": "vide", "codec": "avc1",
                                      "width": 320, "height": 240}])
                         if i % 2 else
                         encode_mkv(1_000_000, float(1000 + i % 9000),
                                    [{"type": 1, "codec": "V_VP9",
                                      "width": 640, "height": 360}]))
                else:
                    p = encode_id3v2([("TIT2", f"t{i}"),
                                      ("TPE1", f"a{i % 97}")]) \
                        if i % 2 else \
                        encode_flac_with_comments(
                            8000, 1, 16, 8000, [("TITLE", f"f{i}")])
                rows.append({"media_id": f"m-{i}", "payload": p})
            yield _pd.DataFrame(rows)

    media_tbl = (
        spark.range(0, n_media, 1, max(cpus, 8))
        .mapInPandas(_gen_media_batch, "media_id string, payload binary")
        .localCheckpoint(eager=True)
    )

    def run_media_sniff() -> int:
        from sigraph_spark.operators.mediameta import image_metadata
        from sigraph_spark.operators.mediatags import media_tags
        from sigraph_spark.operators.multimodal import (
            audio_metadata, video_metadata,
        )

        n = image_metadata(media_tbl).filter(
            F.col("format") != "unknown").count()
        n += audio_metadata(media_tbl).filter(
            F.col("format") != "unknown").count()
        n += video_metadata(media_tbl).filter(
            F.col("format") != "unknown").count()
        n += media_tags(media_tbl).count()
        return n

    extras["media_rows"] = timed("media_sniff", run_media_sniff)
    extras["media_payloads"] = n_media

    # --- pixel/sample-level near-dup: the dedup plane that DECODES --------------
    # (image dHash through the PNG/BMP codecs, audio Haar fingerprint
    # through WAV; near-dups planted across formats so the band joins
    # have real work). Payload counts scale with sf.
    n_px = max(int(20_000 * sf), 200)
    n_au = max(int(4_000 * sf), 50)

    def _gen_px_batch(batches):
        import numpy as _np
        import pandas as _pd

        from sigraph_spark.operators.multimodal import encode_bmp, encode_png

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                g = int(i) // 2  # pairs: same pixels as png AND bmp
                rng = _np.random.default_rng(g)
                w, h = 24 + g % 9, 16 + g % 7
                rgb = rng.integers(0, 256, size=(h, w, 3),
                                   dtype=_np.uint8).tobytes()
                enc = encode_png if i % 2 == 0 else encode_bmp
                rows.append({"media_id": f"px-{i}",
                             "payload": enc(w, h, rgb)})
            yield _pd.DataFrame(rows)

    def _gen_au_batch(batches):
        import numpy as _np
        import pandas as _pd

        from sigraph_spark.operators.audiofp import encode_wav16
        from sigraph_spark.operators.flac import encode_flac

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                g = int(i) // 2
                rng = _np.random.default_rng(10_000 + g)
                x = rng.integers(-8000, 8000, size=4608).astype(_np.int64)
                p = (encode_wav16(8000, x) if i % 2 == 0
                     else encode_flac(8000, x))
                rows.append({"media_id": f"au-{i}", "payload": p})
            yield _pd.DataFrame(rows)

    px_tbl = (
        spark.range(0, n_px, 1, max(cpus, 8))
        .mapInPandas(_gen_px_batch, "media_id string, payload binary")
        .localCheckpoint(eager=True)
    )
    au_tbl = (
        spark.range(0, n_au, 1, max(cpus, 8))
        .mapInPandas(_gen_au_batch, "media_id string, payload binary")
        .localCheckpoint(eager=True)
    )

    def run_pixel_dedup() -> int:
        from sigraph_spark.operators.audiofp import audio_neardup
        from sigraph_spark.operators.imagehash import image_neardup

        return (image_neardup(px_tbl).count()
                + audio_neardup(au_tbl).count())

    extras["pixel_dedup_pairs"] = timed("pixel_dedup", run_pixel_dedup)
    extras["pixel_dedup_payloads"] = n_px + n_au

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline_e2e+operators",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "host_probe_s": host_probe_s,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
