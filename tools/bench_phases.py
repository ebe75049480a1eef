"""Per-operator phase attribution for the composite bench stages (r06).

bench.py is FROZEN for measurement; this file reproduces each composite
stage's exact inputs and times every sub-operator separately so the
optimization work targets the real cost (guide §1.1/§1.4). Counts mirror
bench.py's drains; one JSON line to stdout.

Usage: python tools/bench_phases.py [stage ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from pyspark.sql import functions as F

    from sigraph_spark.session import build_session

    spark = build_session(
        app_name=f"sigraph-bench-phases-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    from sigraph_spark.operators.extract import strip_html_udf as _warm_udf

    warm = spark.range(0, cpus * 8, 1, cpus * 8).select(
        _warm_udf()(F.encode(F.lit("<p>warm</p>"), "UTF-8")).alias("t")
    )
    warm.select(F.sum(F.length("t"))).collect()

    def timed(name: str, fn):
        best_t, out = None, None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            if best_t is None or dt < best_t:
                best_t = dt
        timings[name] = round(best_t, 3)
        return out

    def want(stage: str) -> bool:
        return not only or stage in only

    # --- kg_pipeline ----------------------------------------------------------
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=sf).localCheckpoint(eager=True)

    if want("kg_pipeline"):
        docs_ck = timed(
            "kg_pipeline/extract",
            lambda: extract_pages(pages)
            .select("url", "warc_ts", "text").localCheckpoint(eager=True),
        )
        triples_ck = timed(
            "kg_pipeline/triples",
            lambda: triples_from_docs(docs_ck).localCheckpoint(eager=True),
        )
        timed("kg_pipeline/count", lambda: triples_ck.count())
        mapping = timed(
            "kg_pipeline/link",
            lambda: link_entities(triples_ck).localCheckpoint(eager=True),
        )

        def _canon():
            canon = canonicalize_triples(triples_ck, mapping).join(
                docs_ck.select("url", "warc_ts"), "url"
            )
            edges = (
                canon.groupBy(F.col("subj"), F.col("verb").alias("predicate"),
                              F.col("obj"))
                .agg(F.max(F.struct("warc_ts", "url")).alias("_lw"),
                     F.count(F.lit(1)).alias("weight"))
            )
            return edges.count()

        timed("kg_pipeline/canon_edges", _canon)

    # --- kg_fusion ------------------------------------------------------------
    from sigraph_spark.operators.fusion import (
        entity_summary, fuse_triples, inverse_predicates,
        predicate_subsumption,
    )
    from sigraph_spark.plans.postprocess import claim_source

    bench_triples = triples_from_docs(
        extract_pages(pages).select("url", "text")
    ).localCheckpoint(eager=True)

    if want("kg_fusion"):
        claims = bench_triples.select(
            F.col("actor").alias("subject"),
            F.col("verb").alias("predicate"),
            "object",
            claim_source("url", segments=5).alias("source"),
        )
        timed("kg_fusion/fuse", lambda: fuse_triples(
            claims, "subject", "predicate", "object", "source").count())
        timed("kg_fusion/inverse",
              lambda: inverse_predicates(bench_triples).count())
        timed("kg_fusion/subsumption",
              lambda: predicate_subsumption(bench_triples).count())
        timed("kg_fusion/summary",
              lambda: entity_summary(bench_triples).count())

    # --- ann_pq ---------------------------------------------------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if want("ann_pq"):
        from sigraph_spark.operators.pq import pq_encode, pq_topk, pq_train_lloyd

        books = timed("ann_pq/train",
                      lambda: pq_train_lloyd(emb, m=8, k=8, iters=2))
        codes = timed(
            "ann_pq/encode",
            lambda: pq_encode(emb, books).localCheckpoint(eager=True),
        )
        timed("ann_pq/topk", lambda: pq_topk(codes, books, q, k=10).count())

    # --- keyphrase ------------------------------------------------------------
    docs_tbl = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if want("keyphrase"):
        from sigraph_spark.operators.coref import pronoun_coref
        from sigraph_spark.operators.keyphrase import (rake_keywords,
                                                       textrank_sentences)

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
        timed("keyphrase/textrank",
              lambda: textrank_sentences(derived, top_k=3).count())
        timed("keyphrase/rake", lambda: rake_keywords(docs_tbl, top_k=5).count())
        timed("keyphrase/coref",
              lambda: pronoun_coref(derived, window_sents=2).count())

    # --- distant_supervision --------------------------------------------------
    if want("distant_supervision"):
        from sigraph_spark.operators.distant import distant_supervision

        bench_facts = bench_triples.select(
            F.col("actor").alias("subj"),
            F.col("verb").alias("predicate"),
            F.col("object").alias("obj"),
        )
        ds_docs = extract_pages(pages).select("url", "text").localCheckpoint(
            eager=True)
        timed(
            "distant_supervision/all",
            lambda: distant_supervision(ds_docs, bench_facts,
                                        id_col="url").count(),
        )

    # --- kg_analytics ---------------------------------------------------------
    from sigraph_spark.operators.graph import build_edges, parse_events
    from sigraph_spark.sources.events_map import sigraph_events

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    good_pr, _ = parse_events(sigraph_events(events))
    edges_pr = build_edges(good_pr).select("src", "dst").localCheckpoint(
        eager=True)

    if want("kg_analytics"):
        from sigraph_spark.operators.graphalgo import node_features
        from sigraph_spark.operators.walks import random_walks, skipgram_pairs

        timed("kg_analytics/node_features",
              lambda: node_features(edges_pr).count())
        timed(
            "kg_analytics/walks",
            lambda: skipgram_pairs(
                random_walks(edges_pr, walks_per_node=2, length=4)).count(),
        )

    # --- dedup ----------------------------------------------------------------
    if want("dedup"):
        from sigraph_spark.operators.dedup import (
            minhash_dedup, simhash_candidates,
        )

        timed("dedup/minhash", lambda: minhash_dedup(docs_tbl).count())
        timed("dedup/simhash",
              lambda: simhash_candidates(docs_tbl, max_hamming=3).count())

    # --- contamination --------------------------------------------------------
    if want("contamination"):
        from sigraph_spark.operators.contamination import (decontaminate,
                                                           dup_spans)
        from sigraph_spark.operators.corpus import curation_funnel

        ev = docs_tbl.filter(F.col("doc_id") % 37 == 0)
        tr = docs_tbl.filter(F.col("doc_id") % 37 != 0)
        timed("contamination/decontaminate",
              lambda: decontaminate(tr, ev).count())
        timed("contamination/dup_spans", lambda: dup_spans(docs_tbl).count())
        timed("contamination/funnel",
              lambda: curation_funnel(docs_tbl).count())

    # --- webtext_kg -----------------------------------------------------------
    import __spark_entry__ as entrymod

    def ckpt(df):
        return df.repartition(cpus).localCheckpoint(True)

    if want("webtext_kg"):
        from sigraph_spark.operators.dlfacts import dl_facts
        from sigraph_spark.operators.hearst import hearst_pairs, taxonomy_edges
        from sigraph_spark.operators.htmllists import list_items
        from sigraph_spark.operators.htmltables import table_triples
        from sigraph_spark.operators.jsonld import jsonld_triples, meta_triples
        from sigraph_spark.operators.links import resolve_redirects
        from sigraph_spark.operators.microdata import microdata_triples
        from sigraph_spark.operators.rdfa import rdfa_triples
        from sigraph_spark.operators.textreuse import reuse_spans

        table_pages = ckpt(entrymod._webtext_table_pages(spark, sf=sf))
        hearst_docs = ckpt(entrymod._hearst_corpus(spark, sf=sf))
        reuse_docs = ckpt(entrymod._webtext_reuse_docs(spark, sf=sf))
        alias_edges = ckpt(entrymod._webtext_alias_graph(spark, sf=sf))
        ld_pages = ckpt(entrymod._webtext_jsonld_pages(spark, sf=sf))
        md_pages = ckpt(entrymod._webtext_microdata_pages(spark, sf=sf))
        rd_pages = ckpt(entrymod._webtext_rdfa_pages(spark, sf=sf))
        li_pages = ckpt(entrymod._webtext_list_pages(spark, sf=sf))
        dl_pages = ckpt(entrymod._webtext_dl_pages(spark, sf=sf))

        timed("webtext_kg/tables", lambda: table_triples(table_pages).count())
        timed("webtext_kg/hearst",
              lambda: taxonomy_edges(hearst_pairs(hearst_docs)).count())
        timed("webtext_kg/reuse",
              lambda: reuse_spans(reuse_docs, k=5, min_run=3,
                                  max_gram_df=8).count())
        timed("webtext_kg/redirects",
              lambda: resolve_redirects(alias_edges, max_steps=16).count())
        timed("webtext_kg/jsonld", lambda: jsonld_triples(ld_pages).count())
        timed("webtext_kg/meta", lambda: meta_triples(ld_pages).count())
        timed("webtext_kg/microdata",
              lambda: microdata_triples(md_pages).count())
        timed("webtext_kg/rdfa", lambda: rdfa_triples(rd_pages).count())
        timed("webtext_kg/lists", lambda: list_items(li_pages).count())
        timed("webtext_kg/dlfacts", lambda: dl_facts(dl_pages).count())

    # --- webtext_mining -------------------------------------------------------
    if want("webtext_mining"):
        from sigraph_spark.operators.abbrev import abbrev_pairs, alias_map
        from sigraph_spark.operators.pagination import (
            extract_next_links, page_chains, stitch_chains,
        )
        from sigraph_spark.operators.quantities import extract_quantities
        from sigraph_spark.operators.quotes import extract_quotes
        from sigraph_spark.operators.template import (page_structure,
                                                      template_clusters)

        qt_docs = ckpt(entrymod._webtext_quote_docs(spark, sf=sf))
        ab_docs = ckpt(entrymod._webtext_abbrev_docs(spark, sf=sf))
        qn_docs = ckpt(entrymod._webtext_quantity_docs(spark, sf=sf))
        tp_pages = ckpt(entrymod._webtext_template_pages(spark, sf=sf))
        ch_pages = ckpt(entrymod._webtext_chain_pages(spark, sf=sf))

        timed("webtext_mining/quotes", lambda: extract_quotes(qt_docs).count())
        timed("webtext_mining/abbrev",
              lambda: alias_map(abbrev_pairs(ab_docs)).count())
        timed("webtext_mining/quantities",
              lambda: extract_quantities(qn_docs).count())
        timed("webtext_mining/template",
              lambda: template_clusters(page_structure(tp_pages)).count())
        timed(
            "webtext_mining/pagination",
            lambda: stitch_chains(
                ch_pages.select("url", "text"),
                page_chains(extract_next_links(ch_pages))).count(),
        )

    # --- webtext_fused_scan ---------------------------------------------------
    if want("webtext_fused_scan"):
        from jobs.run_webtext_kg import synthetic_webtext_pages

        from sigraph_spark.operators.fusedscan import fused_struct_claims

        wk_pages = (
            synthetic_webtext_pages(spark, sf).repartition(cpus)
            .localCheckpoint(True)
        )
        timed("webtext_fused_scan/all",
              lambda: fused_struct_claims(wk_pages).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "bench_phases", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf,
                      "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
