"""End-to-end extraction job: documents -> extracted (+ lineage, resume).

The Spark restatement of the reference's flagship flow
(``POST /upload-manuscript``, SURVEY.md §3.1):

    documents ──(mega? no)──> mapInPandas(extract)            ─┐
              └─(mega? yes)─> chunk -> classify -> reassemble ─┴> extracted
    extracted ── write parquet partitioned by partition_key (dynamic
                 overwrite = idempotent per-partition rerun)
              ── lineage append: (stage, partition_key, n_rows,
                 n_errors, wall_ms, 'done', run_id, ts)

Resume: a fresh invocation with ``resume=True`` left-anti joins the
lineage done-keys and recomputes only missing partitions; output
idempotence comes from partition-directory overwrite.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .lineage import (
    append_lineage,
    prune_done,
    read_lineage,
    with_partition_key,
)
from .operators.extract import extract_all

STAGE_EXTRACT = "extract"

# a partition at/over this integer skew ratio vs the p50 (the
# straggler_report convention: ratio * 1000) is a straggler: its
# documents route through the distributed chunk path at a finer
# byte threshold instead of re-running as one fat in-task unit
STRAGGLER_X1000 = 10_000


def _straggler_keys(
    spark: SparkSession,
    docs: DataFrame,
    lineage_dir: str | None,
) -> set[int]:
    """Partitions to route through the chunk path on resume (r4 verdict
    item 3 — the straggler report becomes actionable). Two signal
    sources, union:

    - LINEAGE: ``straggler_report`` rows for the extract stage at/over
      STRAGGLER_X1000 — partitions a prior epoch observed fat (an
      incremental re-run over the same key space hits them again);
    - INPUT BYTES: per-partition sum of the ``n_bytes`` ingest-metadata
      column over the REMAINING docs (a killed run's fat partition has
      no lineage row — but its input size is known before any work).
      One thin-column aggregate, n_buckets output rows; discrete
      median by explicit rank (the straggler_report convention). Only
      computed when the column exists — length(html) would cost a full
      payload scan just to plan one.
    """
    from .lineage import straggler_report

    fat: set[int] = set()
    if lineage_dir:
        lin = read_lineage(spark, lineage_dir)
        if lin is not None:
            rep = straggler_report(lin).filter(
                (F.col("stage") == STAGE_EXTRACT)
                & (F.col("skew_x1000") >= STRAGGLER_X1000)
            )
            fat |= {int(r["partition_key"]) for r in rep.collect()}
    if "n_bytes" in docs.columns:
        sizes = sorted(
            (int(r["pk"]), int(r["pbytes"]))
            for r in docs.groupBy(
                F.col("partition_key").alias("pk")
            )
            .agg(F.sum(F.coalesce(F.col("n_bytes"), F.lit(0))).alias("pbytes"))
            .collect()
        )
        if sizes:
            by_size = sorted(b for _, b in sizes)
            med = max(by_size[-(-len(by_size) // 2) - 1], 1)
            fat |= {
                pk
                for pk, b in sizes
                if b * 1000 >= STRAGGLER_X1000 * med
            }
    return fat


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    *,
    out_dir: str | None = None,
    lineage_dir: str | None = None,
    resume: bool = False,
    n_buckets: int = 64,
    mega_bytes: int | None = 8 << 20,
    chunk_blocks: int = 200,
    run_id: str | None = None,
    commit_batches: int | None = None,
    split_stragglers: bool = True,
    straggler_mega_bytes: int | None = None,
) -> dict:
    """Run the extraction pipeline.

    With ``out_dir`` set, writes the extracted table partitioned by
    ``partition_key`` and appends lineage; returns stats. Without it,
    returns the lazy extracted DataFrame (no materialization) — the
    driver-contract path.

    ``mega_bytes`` defaults to 8 MiB: Arrow batches are bounded by ROW
    COUNT, so documents beyond a few MB must leave the batched normal
    path (a 256-row batch of 100 MB payloads would OOM a Python
    worker) and take the distributed chunk path, which also spreads a
    single giant document across tasks (SURVEY §7.5 item 4).

    ``commit_batches=K``: process the bucket keyspace in K groups, each
    written AND lineage-logged before the next starts — a SIGKILLed job
    loses at most the in-flight group instead of the whole run (the
    partition-granular kill/resume the north rule demands; tested with
    a real SIGKILL in tests/test_kill_resume.py). Cost: the source is
    scanned once per group when it isn't physically partitioned by the
    key — on a production Iceberg table bucketed by hash(url) each
    group prunes to its own files and the extra scans disappear.

    ``split_stragglers`` (resume runs with ``mega_bytes`` set): flagged
    straggler partitions (``_straggler_keys`` — lineage skew report +
    input-bytes skew over the remaining work) route through the
    distributed chunk path at the finer ``straggler_mega_bytes``
    threshold (default mega_bytes/8) instead of re-running as one fat
    in-task unit — byte-identical by the halo proof, so this is a
    physical re-plan only (r4 verdict item 3; planted-partition test
    in tests/test_resume.py).
    """
    from .lineage import done_keys
    from .operators.extract import EXTRACTED_SCHEMA

    docs = with_partition_key(docs, n_buckets)

    n_pruned = 0
    done_before: set[int] = set()
    if resume and lineage_dir:
        done = done_keys(spark, lineage_dir, STAGE_EXTRACT)
        if done is not None:
            done_before = {r["partition_key"] for r in done.collect()}
        n_pruned = len(done_before)
        if done_before:
            docs = docs.filter(~F.col("partition_key").isin(*done_before))

    # keep the ingest-metadata column when the source recorded it — the
    # mega/normal split then prunes on it at scan level (extract_all)
    base_cols = ["partition_key", "url", "html"] + (
        ["n_bytes"] if "n_bytes" in docs.columns else []
    )

    fat_keys: set[int] = set()
    if resume and split_stragglers and mega_bytes is not None:
        fat_keys = _straggler_keys(spark, docs, lineage_dir)
    fine_mega = straggler_mega_bytes or max((mega_bytes or 0) // 8, 64 << 10)

    def extract(subset):
        sel = subset.select(*base_cols)
        if fat_keys:
            keys = sorted(fat_keys)
            ext = extract_all(
                sel.filter(~F.col("partition_key").isin(*keys)),
                mega_bytes=mega_bytes,
                chunk_blocks=chunk_blocks,
            ).unionByName(
                # straggler partitions: same kernels, finer dispatch —
                # documents >= fine_mega fan out as chunks across the
                # cluster instead of one task carrying the whole range
                extract_all(
                    sel.filter(F.col("partition_key").isin(*keys)),
                    mega_bytes=fine_mega,
                    chunk_blocks=chunk_blocks,
                )
            )
        else:
            ext = extract_all(
                sel, mega_bytes=mega_bytes, chunk_blocks=chunk_blocks
            )
        # extract_all consumes (url, html); re-attach the key derivably
        # (no join — the key is a pure function of url).
        return with_partition_key(ext, n_buckets)

    if out_dir is None:
        return {
            "extracted": extract(docs),
            "pruned_partitions": n_pruned,
            "straggler_split_partitions": sorted(fat_keys),
        }

    # bucket groups: one group = one write+lineage commit unit
    todo_keys = [k for k in range(n_buckets) if k not in done_before]
    k_groups = max(1, min(commit_batches or 1, len(todo_keys) or 1))
    step = -(-len(todo_keys) // k_groups) if todo_keys else 1
    groups = [todo_keys[i : i + step] for i in range(0, len(todo_keys), step)]

    n_docs = n_errors = n_parts = 0
    wall_total = 0
    for gi, keys in enumerate(groups):
        subset = (
            docs
            if len(groups) == 1
            else docs.filter(F.col("partition_key").isin(*keys))
        )
        t0 = time.monotonic()
        # single upsert seam shared with the staged pipeline: Iceberg
        # overwritePartitions when a catalog is configured, dynamic
        # parquet partition-overwrite otherwise (staged.merge_by_key)
        from .staged import merge_by_key

        merge_by_key(extract(subset), out_dir)
        wall_ms = int((time.monotonic() - t0) * 1000)
        wall_total += wall_ms

        # Per-partition counters from the just-written columnar output:
        # a cheap scan of two thin columns, never the text. Explicit
        # schema: an empty run writes no parquet footers to infer from.
        from .staged import read_stage

        written = read_stage(
            spark, out_dir, EXTRACTED_SCHEMA + ", partition_key int"
        ).filter(F.col("partition_key").isin(*keys))
        per_key = written.groupBy("partition_key").agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("status") == "error").cast("long")).alias("n_errors"),
        )
        got = {r["partition_key"]: r for r in per_key.collect()}
        # keys with zero input rows still get a lineage row (n_rows=0):
        # without one they stay in todo forever and every resume re-runs
        # an empty extract job for them
        rows = [
            (
                k,
                got[k]["n_rows"] if k in got else 0,
                got[k]["n_errors"] if k in got else 0,
            )
            for k in keys
        ]
        for _, n_r, n_e in rows:
            n_parts += 1
            n_docs += n_r
            n_errors += n_e
        if lineage_dir and rows:
            per_key_df = spark.createDataFrame(
                rows, schema="partition_key int, n_rows long, n_errors long"
            )
            append_lineage(
                spark, lineage_dir, STAGE_EXTRACT, per_key_df, wall_ms, run_id
            )

    return {
        "out_dir": out_dir,
        "n_docs": int(n_docs),
        "n_errors": int(n_errors),
        "n_partitions": n_parts,
        "pruned_partitions": n_pruned,
        "commit_groups": len(groups),
        "wall_ms": wall_total,
        "straggler_split_partitions": sorted(fat_keys),
        "straggler_mega_bytes": fine_mega if fat_keys else None,
    }


def extracted_to_documents(extracted: DataFrame) -> DataFrame:
    """Bridge the two halves of a web-scale training pipeline: the
    extracted table (url, status, extracted_text, lang) re-shaped as
    the ``documents`` curation input (doc_id, text, lang, source,
    n_chars) that every textops operator consumes.

    doc_id is a pure function of the url (non-negative xxhash64), so
    dedup/decontamination/sampling decisions are stable across reruns
    and partitionings — the same determinism rule as the extraction
    itself. source is the full lowercased hostname with a leading
    ``www.`` stripped (the per-site stratum a mixing policy keys on —
    the first label alone would collapse every www-prefixed site into
    one stratum). Error rows carry no text and are dropped here; their
    lineage counters already recorded them."""
    return (
        extracted.filter(F.col("status") == "ok")
        .select(
            # shiftrightunsigned keeps the id positive without abs()'s
            # Long.MIN_VALUE edge case
            F.shiftrightunsigned(F.xxhash64("url"), 1).alias("doc_id"),
            F.col("extracted_text").alias("text"),
            "lang",
            F.regexp_extract(
                F.lower("url"), r"^[a-z][a-z0-9+.-]*://(?:www\.)?([^/:?#]+)", 1
            ).alias("source"),
            F.length("extracted_text").alias("n_chars"),
        )
    )


def run_crawl_to_corpus(
    spark: SparkSession,
    docs: DataFrame,
    work_dir: str,
    *,
    n_buckets: int = 64,
    resume: bool = False,
    benchmark_dir: str | None = None,
) -> dict:
    """The full north-star flow as ONE chained job: raw pages ->
    byte-identical extraction (lineage + resume) -> documents-shaped
    stage table -> curated training corpus (near-dup canonicalized,
    quality-gated, and — when ``benchmark_dir`` supplies an eval-suite
    documents table — decontaminated against ITS 13-grams).

    Curation goes through ``textops.curate_documents``, NOT the
    registry's ``training_corpus_final``: that query's synthetic
    in-corpus benchmark convention (doc_id % 29) exists for its DuckDB
    oracle and would silently sacrifice an arbitrary 1/29 of a real
    crawl as "the eval set".

    The intermediate lands as ``<work_dir>/docs/documents.parquet`` —
    the standard curation input layout — so the whole textops family
    (and its DuckDB oracles) runs unchanged over extraction output.
    Each half keeps its own failure/restart story: extraction resumes
    at partition granularity via lineage; curation is a deterministic
    pure function of the stage table."""
    from .operators.textops import curate_documents

    ext_stats = run_extraction(
        spark,
        docs,
        out_dir=f"{work_dir}/extracted",
        lineage_dir=f"{work_dir}/lineage",
        n_buckets=n_buckets,
        resume=resume,
    )
    from .operators.extract import EXTRACTED_SCHEMA
    from .staged import read_stage

    extracted = read_stage(
        spark, f"{work_dir}/extracted", EXTRACTED_SCHEMA + ", partition_key int"
    )
    docs_dir = f"{work_dir}/docs"
    extracted_to_documents(extracted).write.mode("overwrite").parquet(
        f"{docs_dir}/documents.parquet"
    )
    corpus = curate_documents(spark, docs_dir, benchmark_dir)
    corpus.write.mode("overwrite").parquet(f"{work_dir}/corpus")
    n_corpus = spark.read.parquet(f"{work_dir}/corpus").count()
    return {
        **{f"extract_{k}": v for k, v in ext_stats.items()},
        "docs_dir": docs_dir,
        "corpus_dir": f"{work_dir}/corpus",
        "n_corpus_docs": int(n_corpus),
    }


def run_curation_staged(
    spark: SparkSession,
    docs_dir: str,
    work_dir: str,
    *,
    benchmark_dir: str | None = None,
    lineage_dir: str | None = None,
    run_id: str | None = None,
    resume: bool = False,
) -> dict:
    """The composed curation pipeline as STAGED jobs — the 100 TB
    deployment shape (VERDICT r2 item 6): every stage materializes its
    output table and the next stage reads THAT parquet, exactly how a
    multi-day production run checkpoints between stages so a failure
    rewinds one stage, not the whole pipeline. Per-stage lineage rows
    (stage, n_rows, wall_ms) land beside the extraction lineage.

    Chain: exact-dedup pre-collapse -> minhash signatures (over
    representatives only) -> LSH candidate pairs -> connected
    components -> canonical (deduped) docs table -> (optional)
    benchmark decontamination -> boilerplate scrub -> final
    quality-gated corpus.

    The exact stage (round-4 verdict item 2) maps every doc to the
    min-id representative of its md5(text) class, and every later
    stage sees only representatives. This keeps each stage O(distinct
    docs) — a viral 10^7-page mirror cluster collapses to ONE row
    before any shingle explodes — and provably changes nothing: an
    exact duplicate has the same text, hence the same shingles,
    signature and band keys as its representative, so every LSH link
    through a duplicate has a twin through its representative; the
    component of each exact class equals its representative's
    component; and the cluster-min doc is always its own md5-class min
    (anything below it in the class would also be below it in the
    cluster). Kept set identical; pytest-proved against the uncollapsed
    registry query (tests/test_curation_staged.py).

    Two ordering rules a production pipeline follows, both encoded
    here: (1) the boilerplate census runs over the DEDUPED corpus —
    against the raw corpus every near-dup cluster's shared units hit
    SCRUB_MIN_DF and the scrub guts the one canonical copy the dedup
    kept; (2) the quality gate runs over the SCRUBBED text (boilerplate
    must not count toward length/stopword floors). Decontamination
    checks the original canonical text (conservative: scrubbing can
    only split eval grams, never create them).

    Scale notes: sig/pairs/components reuse the registry operators'
    compute bodies (same banding, df caps, checkpointed CC rounds); the
    final assembly joins the scrubbed table to the canonical table on
    doc_id (at deployment scale both stage tables are bucketed by
    doc_id so this join is co-located); kill-lists (dup drops,
    contaminated ids) broadcast into anti-joins against one scan.

    Resume (stage-granular twin of ``run_extraction``'s
    partition-granular resume): the lineage done-row is the stage's
    COMMIT MARKER — it is appended only after the stage table is fully
    written, so ``resume=True`` (requires ``lineage_dir``) skips any
    stage with a done-row and re-runs everything else with an
    overwrite. A kill mid-write leaves a partial table and no marker
    -> that stage reruns; a kill between write and marker reruns one
    completed write — idempotent either way. Markers alone are not
    trusted blindly: a LATER non-resume rerun into the same work_dir
    killed mid-overwrite leaves a corrupt stage table while the first
    run's marker still exists, so a skipped stage is VALIDATED against
    its marker (footer-only row count == the latest done-row's n_rows
    AND an order-insensitive crc fingerprint of the key column matches
    the marker's — count-equality alone would trust a same-cardinality
    table rewritten from different upstream data; unreadable or
    mismatched -> recompute), and any recompute CASCADES to
    every later stage (their tables may derive from the corrupt one).
    Engine-agnostic: no reliance on parquet ``_SUCCESS`` files, so
    stage tables can move behind the Iceberg ``merge_by_key`` seam
    unchanged."""
    from .operators.textops import (
        DECON_W,
        QUALITY_STOPWORDS,
        _cc_from_pairs,
        _pairs_from_sig,
        _sig_from_docs,
        _word_ngrams,
        boilerplate_scrub_chunks,
    )
    from .operators.tables import load

    stats: dict = {"stages": {}, "work_dir": work_dir}

    # latest done-marker (row count + content fingerprint) per stage:
    # the skip path validates the on-disk table against BOTH (ADVICE
    # r3: marker keyed by stage name alone would trust a table a LATER
    # killed rerun corrupted; ADVICE r4: count-equality alone would
    # trust a same-cardinality table rewritten from different upstream
    # data). Ties on ts break on run_id so the winner is deterministic
    # under equal timestamps (ADVICE r4).
    done_stages: dict[str, tuple[int, int | None]] = {}
    if resume:
        if not lineage_dir:
            raise ValueError("resume=True requires lineage_dir")
        lin = read_lineage(spark, lineage_dir)
        if lin is not None:
            latest: dict[str, tuple] = {}
            cols = ["stage", "n_rows", "ts", "run_id"]
            has_fp = "fp" in lin.columns
            for r in (
                lin.filter(
                    (F.col("status") == "done")
                    & F.col("stage").startswith("curate_")
                )
                .select(*cols, *(["fp"] if has_fp else []))
                .collect()
            ):
                name = r["stage"][len("curate_"):]
                key = (r["ts"], r["run_id"] or "")
                if name not in latest or key > latest[name][0]:
                    latest[name] = (
                        key, r["n_rows"], r["fp"] if has_fp else None
                    )
            done_stages = {
                k: (int(v[1]), None if v[2] is None else int(v[2]))
                for k, v in latest.items()
            }

    state = {"dirty": False}  # a recompute invalidates later stages

    def stage(name: str, df_thunk, path: str) -> int:
        # df_thunk is a THUNK, not a DataFrame: several compute bodies
        # (_sig_from_docs, _pairs_from_sig, _cc_from_pairs,
        # boilerplate_scrub_chunks) run eager localCheckpoint()/count()
        # work at DataFrame-BUILD time, so a resumed stage must not
        # even construct its plan — otherwise "skipped" stages still
        # pay nearly their full compute.
        from .lineage import content_fingerprint

        if name in done_stages and not state["dirty"]:
            want_n, want_fp = done_stages[name]
            try:
                tbl = spark.read.parquet(path)
                n = tbl.count()  # footer-only
                # marker fp NULL (pre-fingerprint lineage row) degrades
                # to count-only validation; otherwise the skip also
                # costs one thin-column scan — still far below a
                # recompute, and it catches the count-collision case
                ok = n == want_n and (
                    want_fp is None or content_fingerprint(tbl) == want_fp
                )
            except Exception:
                ok = False  # unreadable/missing table -> recompute
            if ok:
                stats["stages"][name] = {
                    "rows": int(n), "wall_ms": 0, "resumed": True,
                }
                return int(n)
            # stale marker (e.g. a later non-resume rerun SIGKILLed
            # mid-overwrite left a partial/divergent table): fall through
        state["dirty"] = True
        t0 = time.time()
        df_thunk().write.mode("overwrite").parquet(path)
        written = spark.read.parquet(path)
        n = written.count()  # footer-only count
        fp = content_fingerprint(written)
        wall_ms = int((time.time() - t0) * 1000)
        stats["stages"][name] = {"rows": int(n), "wall_ms": wall_ms}
        if lineage_dir:
            counts = spark.createDataFrame(
                [(0, n, 0)], "partition_key int, n_rows long, n_errors long"
            )
            append_lineage(
                spark, lineage_dir, f"curate_{name}", counts, wall_ms,
                run_id=run_id, fp=fp,
            )
        return int(n)

    # exact pre-collapse: (doc_id, representative) — shuffles only the
    # 32-char fp (text never travels). min-id per md5 class comes from
    # a groupBy (map-side partial agg, so a 10^7-page viral mirror's
    # hot fp combines BEFORE the shuffle) joined back on fp (a join AQE
    # can skew-split) — deliberately NOT a window min, which would sink
    # the whole megacluster into one unsplittable reducer partition
    def _exact():
        d = load(spark, docs_dir, "documents").select(
            "doc_id", F.md5("text").alias("fp")
        )
        reps = d.groupBy("fp").agg(
            F.min("doc_id").alias("representative")
        )
        return d.join(reps, "fp").select("doc_id", "representative")

    stage("exact", _exact, f"{work_dir}/exact")

    def _reps():
        # representatives' documents: equi-join on doc_id (co-located
        # at deployment scale where both tables are bucketed by doc_id;
        # the rep set is O(distinct docs), so never broadcast)
        reps = (
            spark.read.parquet(f"{work_dir}/exact")
            .filter(F.col("doc_id") == F.col("representative"))
            .select("doc_id")
        )
        return load(spark, docs_dir, "documents").join(reps, "doc_id")

    stage(
        "minhash_sig",
        lambda: _sig_from_docs(_reps()),
        f"{work_dir}/sig",
    )
    stage(
        "lsh_pairs",
        lambda: _pairs_from_sig(spark.read.parquet(f"{work_dir}/sig")),
        f"{work_dir}/pairs",
    )
    stage(
        "components",
        lambda: _cc_from_pairs(spark.read.parquet(f"{work_dir}/pairs")),
        f"{work_dir}/components",
    )

    # canonical: the dedup payoff materialized as a full documents
    # table — keep exact representatives (equi-join on the exact map),
    # minus near-dup non-canonical reps (tiny CC kill-list, broadcast
    # into an anti-join). One corpus scan; the stage dir follows the
    # <dir>/documents.parquet layout so the downstream operators run
    # over it unchanged.
    def _canonical():
        comp = spark.read.parquet(f"{work_dir}/components")
        dup_drops = comp.filter(
            F.col("doc_id") != F.col("component")
        ).select("doc_id")
        return (
            load(spark, docs_dir, "documents")
            .join(
                spark.read.parquet(f"{work_dir}/exact").filter(
                    F.col("doc_id") == F.col("representative")
                ).select("doc_id"),
                "doc_id",
            )
            .join(F.broadcast(dup_drops), "doc_id", "left_anti")
        )

    canon_dir = f"{work_dir}/canonical"
    stage("canonical", _canonical, f"{canon_dir}/documents.parquet")
    if benchmark_dir is not None:

        def _contaminated():
            bench = (
                _word_ngrams(
                    load(spark, benchmark_dir, "documents"), DECON_W, "g"
                )
                .select(F.md5("g").alias("h"))
                .distinct()
            )
            # non-distinct corpus stream: broadcast join shuffles
            # nothing, and only the (deduped) contaminated doc_id set
            # survives — see decontaminate_ngram's docstring
            corpus_grams = _word_ngrams(
                load(spark, canon_dir, "documents"), DECON_W, "g",
                distinct=False,
            ).select("doc_id", F.md5("g").alias("h"))
            return (
                corpus_grams.join(F.broadcast(bench), "h")
                .select("doc_id")
                .distinct()
            )

        stage("decontaminate", _contaminated, f"{work_dir}/contaminated")
    stage(
        "scrub",
        lambda: boilerplate_scrub_chunks(spark, canon_dir),
        f"{work_dir}/scrubbed",
    )

    # final assembly: quality gate over scrubbed text, kill-lists
    # broadcast-anti-joined against the one scan
    def _final():
        scrubbed = spark.read.parquet(f"{work_dir}/scrubbed")
        langs = load(spark, canon_dir, "documents").select("doc_id", "lang")
        words = F.split("cleaned", " ")
        n_words = F.size(words)
        n_stop = F.size(
            F.filter(words, lambda x: x.isin(*QUALITY_STOPWORDS))
        )
        final = (
            scrubbed.join(langs, "doc_id")
            .select(
                "doc_id", "lang", F.col("cleaned").alias("text"),
                n_words.alias("n_words"), n_stop.alias("n_stop"),
                F.length("cleaned").alias("n_chars"),
            )
            .filter(
                (F.col("n_words") >= 20)
                & (F.col("n_chars") >= 100)
                & (
                    ~F.col("lang").isin("en", "de")
                    | (F.lit(10) * F.col("n_stop") >= F.col("n_words"))
                )
            )
            .select("doc_id", "lang", "n_words", "text")
        )
        if benchmark_dir is not None:
            cont = spark.read.parquet(f"{work_dir}/contaminated")
            final = final.join(F.broadcast(cont), "doc_id", "left_anti")
        return final

    n_final = stage("final_corpus", _final, f"{work_dir}/corpus")
    stats["n_corpus"] = n_final
    stats["total_wall_ms"] = sum(
        s["wall_ms"] for s in stats["stages"].values()
    )
    return stats
