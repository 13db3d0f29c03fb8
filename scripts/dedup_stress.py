#!/usr/bin/env python
"""Composed dedup-pipeline stress at the 100x shape (VERDICT r2 #6).

Generates a deterministic N-doc corpus (default 1M) with PLANTED
structure, then runs the full staged curation chain
(``pipeline.run_curation_staged``: minhash sig -> LSH pairs -> CC ->
canonical -> decontaminate -> scrub -> final corpus) at two
parallelism levels, fresh pinned JVM each, and reports per-stage
wall / rows / docs-per-sec plus the level-to-level scaling efficiency.

Planted structure (all deterministic, xxhash64-keyed — no RNG):

- every doc_id block of 20: ids with m = doc_id%20 in {0..3} form a
  dedup cluster sharing one seed — m=0 and m=3 are EXACT duplicates,
  m=1 and m=2 each differ by one word (near-dups at jaccard ~0.9, well
  above the LSH bands' threshold) -> expected drop rate ~15%.
- per-site 8-word boilerplate chunk appended to every third cluster
  seed (site = hash(seed) over n/100 sites, so each boilerplate
  variant lands in ~33 docs — document-frequency >= SCRUB_MIN_DF, so
  the scrub removes it; the chunk is ONE scrub unit wide so it cannot
  dominate minhash signatures the way a viral 33%-of-corpus phrase
  would).
- benchmark table = the first 16 words of every 997th unique doc ->
  those docs are contaminated by construction and must exit at the
  decontaminate gate.
- word mix is ~23% quality-gate stopwords so en/de docs pass the
  stopword-density floor; langs cycle en/en/en/de/hi/sa per cluster.

The chain is pure JVM (built-in functions only — no Python UDF
workers), so pinning N executor cores + a 2-core driver allowance per
level bounds the compute honestly (same protocol as
scripts/scaling_evidence.py; this VM throttles above ~16-22 busy
cores, so read the 8->32 pair against the measured hardware ceiling).

Usage: python scripts/dedup_stress.py [n_docs] [levels...]
       (defaults: 1_000_000 docs, levels 8 32)
Appends/updates the "## Composed dedup-pipeline stress" section in
BENCH.md when run at >= 1M docs; prints one RESULT json line always.
NOTHING else may run concurrently (noisy-VM discipline).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LEVELS = [int(x) for x in sys.argv[2:]] or [8, 32]
VOCAB_N = 512
CORPUS_VERSION = 1

RUN_SNIPPET = r"""
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from win64_local_ocr_tool_spark.session import get_spark
from win64_local_ocr_tool_spark.pipeline import run_curation_staged

cpus, docs_dir, bench_dir, work_dir = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
shutil.rmtree(work_dir, ignore_errors=True)
spark = get_spark("dedup-stress", master=f"local[{{cpus}}]")
t0 = time.monotonic()
stats = run_curation_staged(
    spark, docs_dir, work_dir + "/work",
    benchmark_dir=bench_dir, lineage_dir=work_dir + "/lineage")
wall = time.monotonic() - t0
final = spark.read.parquet(work_dir + "/work/corpus")
row = final.select(
    F.count("*").alias("n"),
    F.sum(F.crc32(F.concat(F.col("doc_id").cast("string"),
                           F.md5("text")))).alias("ck"),
).collect()[0]
print("RESULT " + json.dumps({{
    "cpus": cpus, "wall_s": round(wall, 2), "stages": stats["stages"],
    "n_corpus": stats["n_corpus"], "checksum": int(row["ck"]),
    "n_final": int(row["n"])}}))
spark.stop()
"""


def synth_corpus(spark, n: int, parts: int = 256):
    """Deterministic planted-structure corpus (docstring above)."""
    from win64_local_ocr_tool_spark.operators.textops import (
        QUALITY_STOPWORDS,
    )

    vocab = (QUALITY_STOPWORDS * 8) + [
        f"w{i:03d}" for i in range(VOCAB_N - 8 * len(QUALITY_STOPWORDS))
    ]
    assert len(vocab) == VOCAB_N
    from pyspark.sql import functions as F

    V = F.array(*[F.lit(w) for w in vocab])
    n_sites = max(64, n // 100)
    d = spark.range(0, n, 1, parts).select(F.col("id").alias("doc_id"))
    m = (F.col("doc_id") % 20).alias("m")
    seed = (
        F.when(F.col("doc_id") % 20 <= 3,
               F.col("doc_id") - F.col("doc_id") % 20)
        .otherwise(F.col("doc_id"))
        .alias("seed")
    )
    d = d.select("doc_id", m, seed)
    d = d.select(
        "doc_id", "m", "seed",
        (F.lit(56) + F.pmod(F.xxhash64("seed"), F.lit(4)) * 8)
        .cast("int").alias("nw"),
        F.pmod(F.xxhash64("seed", F.lit(777)), F.lit(n_sites)).alias("site"),
    )

    def pick(h):
        return F.element_at(V, (F.pmod(h, F.lit(VOCAB_N)) + 1).cast("int"))

    words = F.transform(
        F.sequence(F.lit(1), F.col("nw")),
        lambda i: F.when(
            F.col("m").isin(1, 2) & (i == F.lit(5) + F.col("m") * 7),
            pick(F.xxhash64(F.col("seed"), i + F.lit(9999))),
        ).otherwise(pick(F.xxhash64(F.col("seed"), i))),
    )
    boiler = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda j: pick(F.xxhash64(F.col("site"), j + F.lit(5000))),
    )
    allw = F.when(
        F.pmod(F.col("seed"), F.lit(3)) == 0, F.concat(words, boiler)
    ).otherwise(words)
    langs = F.array(*[F.lit(x) for x in ("en", "en", "en", "de", "hi", "sa")])
    return d.select(
        "doc_id",
        F.array_join(allw, " ").alias("text"),
        F.element_at(
            langs, (F.pmod(F.xxhash64("seed", F.lit(11)), F.lit(6)) + 1)
            .cast("int"),
        ).alias("lang"),
        F.concat(F.lit("site"), F.col("site").cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))


def run_level(cpus: int, docs_dir: str, bench_dir: str, work: str) -> dict:
    code = RUN_SNIPPET.format(repo=REPO)
    env = dict(os.environ, PYTHONPATH=REPO)
    n_cores = min(cpus + 2, os.cpu_count())
    p = subprocess.run(
        ["taskset", "-c", f"0-{n_cores - 1}", sys.executable, "-c", code,
         str(cpus), docs_dir, bench_dir, work],
        capture_output=True, text=True, env=env, timeout=7200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}: {p.stderr[-2000:]}")


def main() -> None:
    sys.path.insert(0, REPO)
    from win64_local_ocr_tool_spark.session import get_spark
    from pyspark.sql import functions as F

    root = f"/tmp/dedup_stress/v{CORPUS_VERSION}_n{N_DOCS}"
    docs_dir, bench_dir = f"{root}/docs", f"{root}/bench"
    if not os.path.exists(f"{docs_dir}/documents.parquet/_SUCCESS"):
        spark = get_spark("gen", master="local[32]")
        synth_corpus(spark, N_DOCS).write.mode("overwrite").parquet(
            f"{docs_dir}/documents.parquet"
        )
        corpus = spark.read.parquet(f"{docs_dir}/documents.parquet")
        bench = (
            corpus.filter(
                (F.col("doc_id") % 997 == 0) & (F.col("doc_id") % 20 > 3)
            )
            .select(
                "doc_id",
                F.array_join(
                    F.slice(F.split("text", " "), 1, 16), " "
                ).alias("text"),
                "lang", "source",
            )
            .withColumn("n_chars", F.length("text"))
        )
        bench.coalesce(1).write.mode("overwrite").parquet(
            f"{bench_dir}/documents.parquet"
        )
        spark.stop()

    runs: dict[int, dict] = {}
    for cpus in LEVELS:
        runs[cpus] = run_level(
            cpus, docs_dir, bench_dir, f"{root}/run_c{cpus}"
        )
        print(f"level local[{cpus}]: {json.dumps(runs[cpus])}", flush=True)

    cks = {r["checksum"] for r in runs.values()}
    assert len(cks) == 1, f"final corpus differs across levels: {runs}"
    lo, hi = LEVELS[0], LEVELS[-1]
    tp = {c: N_DOCS / runs[c]["wall_s"] for c in LEVELS}
    eff = round((tp[hi] / tp[lo]) / (hi / lo), 3)
    result = {
        "n_docs": N_DOCS,
        "levels": {
            str(c): {
                "wall_s": runs[c]["wall_s"],
                "docs_per_sec": round(tp[c], 1),
                "stages": runs[c]["stages"],
            }
            for c in LEVELS
        },
        "n_corpus": runs[lo]["n_corpus"],
        "identical_across_levels": True,
        "scaling_pair": f"local[{lo}] -> local[{hi}]",
        "scaling_efficiency": eff,
    }
    print("RESULT " + json.dumps(result))

    if N_DOCS < 1_000_000:
        return
    stage_rows = "\n".join(
        f"| {name} | {runs[lo]['stages'][name]['rows']} | "
        f"{runs[lo]['stages'][name]['wall_ms'] / 1000:.1f} | "
        f"{runs[hi]['stages'][name]['wall_ms'] / 1000:.1f} |"
        for name in runs[lo]["stages"]
    )
    md = f"""## Composed dedup-pipeline stress ({N_DOCS:,} docs)

One staged job (`pipeline.run_curation_staged`): minhash sig -> LSH
pairs -> connected components -> canonical corpus -> decontaminate ->
boilerplate scrub -> quality-gated final corpus, every stage
materialized to parquet with a lineage row (the multi-day-production
checkpoint shape). Corpus: {N_DOCS:,} planted-structure docs
(`scripts/dedup_stress.py` docstring — 15% near/exact dup members,
per-site boilerplate, planted benchmark contamination). Chain is pure
JVM (no Python UDF workers); levels pinned, fresh JVM, run alone.

| stage | rows | local[{lo}] wall (s) | local[{hi}] wall (s) |
|---|---|---|---|
{stage_rows}

- end-to-end: local[{lo}] {runs[lo]['wall_s']}s
  ({tp[lo]:,.0f} docs/s) -> local[{hi}] {runs[hi]['wall_s']}s
  ({tp[hi]:,.0f} docs/s); scaling efficiency **{eff}**
  (read against the measured raw-CPU ceiling for 8->32 on this VM —
  see the scaling-evidence table above; the VM throttles above ~16-22
  busy cores).
- final corpus: {runs[lo]['n_corpus']:,} docs; checksum-identical
  across levels (order-insensitive crc32 over (doc_id, md5(text))).
- every stage's output is O(corpus): pairs ~= 0.36N (planted clusters
  + bounded boilerplate collisions), components cover only pair
  members, kill-lists broadcast — no stage materializes anything
  super-linear.

Generated by `scripts/dedup_stress.py`.
"""
    bench_path = os.path.join(REPO, "BENCH.md")
    prev = open(bench_path).read()
    marker = "## Composed dedup-pipeline stress"
    idx = prev.find(marker)
    if idx != -1:
        end = prev.find("\n## ", idx + 1)
        prev = prev[:idx] + (prev[end + 1:] if end != -1 else "")
        if idx == len(prev):
            prev = prev.rstrip() + "\n\n"
    open(bench_path, "w").write(prev.rstrip() + "\n\n" + md)
    print("wrote BENCH.md section")


if __name__ == "__main__":
    main()
