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

``--adversarial`` (VERDICT r3 items 1/5) swaps in the skew-hostile
corpus a crawl actually throws at a dedup pipeline:

- an EXACT-duplicate megacluster: the first MEGA_EXACT (10k) ids all
  carry byte-identical text (one parked-domain mirror). The staged
  chain's exact pre-collapse stage must reduce it to ONE row before
  any shingle explodes.
- a NEAR-duplicate megacluster: the next MEGA_NEAR (2k) ids share a
  seed but each flips one word at a doc_id-keyed position — not exact
  dups, so they reach minhash, and their band buckets hold ~2k members
  each. Bounded pair emission (lshpairs.BUCKET_PAIR_CAP) must emit
  O(B) star edges per bucket, not B^2/2 pairs.
- Zipf-ish site mix: site = floor(n_sites^u) for a hash-uniform u, so
  a handful of sites own a large share of docs (hot boilerplate keys).

The run asserts every stage's output rows stay O(corpus) and reports
the constants (pairs/doc, sig rows vs distinct docs).

Usage: python scripts/dedup_stress.py [n_docs] [levels...] [--adversarial]
       (defaults: 1_000_000 docs, levels 8 32)
Appends/updates its BENCH.md section ("## Composed dedup-pipeline
stress" / "## Adversarial skew stress") when run at >= 1M docs; prints
one RESULT json line always.
NOTHING else may run concurrently (noisy-VM discipline).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_args = [a for a in sys.argv[1:] if a != "--adversarial"]
ADVERSARIAL = "--adversarial" in sys.argv[1:]
N_DOCS = int(_args[0]) if _args else 1_000_000
LEVELS = [int(x) for x in _args[1:]] or [8, 32]
VOCAB_N = 512
CORPUS_VERSION = 1
MEGA_EXACT = 10_000  # adversarial: ids [0, MEGA_EXACT) byte-identical
MEGA_NEAR = 2_000    # adversarial: next ids near-dup one shared seed

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


def synth_corpus(spark, n: int, parts: int = 256, adversarial: bool = False):
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
    base_m = F.col("doc_id") % 20
    base_seed = F.when(base_m <= 3, F.col("doc_id") - base_m).otherwise(
        F.col("doc_id")
    )
    if adversarial:
        assert n > (MEGA_EXACT + MEGA_NEAR) * 2
        # m=8: exact-dup megacluster member; m=9: near-dup megacluster
        m = (
            F.when(F.col("doc_id") < MEGA_EXACT, F.lit(8))
            .when(F.col("doc_id") < MEGA_EXACT + MEGA_NEAR, F.lit(9))
            .otherwise(base_m)
            .alias("m")
        )
        seed = (
            F.when(F.col("doc_id") < MEGA_EXACT, F.lit(0))
            .when(
                F.col("doc_id") < MEGA_EXACT + MEGA_NEAR, F.lit(MEGA_EXACT)
            )
            .otherwise(base_seed)
            .alias("seed")
        )
    else:
        m = base_m.alias("m")
        seed = base_seed.alias("seed")
    d = d.select("doc_id", m, seed)
    site_u = F.pmod(F.xxhash64("seed", F.lit(777)), F.lit(1_000_000))
    if adversarial:
        # Zipf-ish heavy tail: site = floor(n_sites^u), u ~ U[0,1) — a
        # log-uniform map, so low site ids own a large share of seeds
        site = F.floor(
            F.exp(site_u / F.lit(1_000_000.0) * F.log(F.lit(float(n_sites))))
        )
    else:
        site = F.pmod(F.xxhash64("seed", F.lit(777)), F.lit(n_sites))
    d = d.select(
        "doc_id", "m", "seed",
        (F.lit(56) + F.pmod(F.xxhash64("seed"), F.lit(4)) * 8)
        .cast("int").alias("nw"),
        site.alias("site"),
    )

    def pick(h):
        return F.element_at(V, (F.pmod(h, F.lit(VOCAB_N)) + 1).cast("int"))

    words = F.transform(
        F.sequence(F.lit(1), F.col("nw")),
        lambda i: F.when(
            F.col("m").isin(1, 2) & (i == F.lit(5) + F.col("m") * 7),
            pick(F.xxhash64(F.col("seed"), i + F.lit(9999))),
        )
        .when(
            # near-dup megacluster: flip ONE word at a doc_id-keyed
            # position with a doc_id-keyed replacement — every member
            # differs from the seed at one position and from every
            # other member at <= two, so none are exact duplicates
            (F.col("m") == 9)
            & (i == F.pmod(F.xxhash64("doc_id"), F.lit(40)) + 1),
            pick(F.xxhash64(F.col("doc_id"), i + F.lit(4321))),
        )
        .otherwise(pick(F.xxhash64(F.col("seed"), i))),
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

    tag = "_adv" if ADVERSARIAL else ""
    root = f"/tmp/dedup_stress/v{CORPUS_VERSION}{tag}_n{N_DOCS}"
    docs_dir, bench_dir = f"{root}/docs", f"{root}/bench"
    if not os.path.exists(f"{docs_dir}/documents.parquet/_SUCCESS"):
        spark = get_spark("gen", master="local[32]")
        synth_corpus(
            spark, N_DOCS, adversarial=ADVERSARIAL
        ).write.mode("overwrite").parquet(f"{docs_dir}/documents.parquet")
        corpus = spark.read.parquet(f"{docs_dir}/documents.parquet")
        bench_pred = (F.col("doc_id") % 997 == 0) & (
            F.col("doc_id") % 20 > 3
        )
        if ADVERSARIAL:  # keep megacluster text out of the eval suite
            bench_pred = bench_pred & (
                F.col("doc_id") >= MEGA_EXACT + MEGA_NEAR
            )
        bench = (
            corpus.filter(bench_pred)
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
        "adversarial": ADVERSARIAL,
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
    st = runs[lo]["stages"]
    # linearity gates: no stage's output may exceed c*N, with c printed
    per_doc = {k: round(v["rows"] / N_DOCS, 3) for k, v in st.items()}
    result["stage_rows_per_doc"] = per_doc
    assert all(v["rows"] <= 3 * N_DOCS for v in st.values()), per_doc
    if ADVERSARIAL:
        # exact pre-collapse killed the 10k megacluster before minhash
        assert st["minhash_sig"]["rows"] <= N_DOCS - MEGA_EXACT + 1, st
        # bounded bucket emission: the 2k near-dup megacluster emits
        # O(B) star edges, not B^2/2 ~ 2M pairs
        assert st["lsh_pairs"]["rows"] <= 1.0 * N_DOCS, per_doc
    print("RESULT " + json.dumps(result))

    if N_DOCS < 1_000_000:
        return
    stage_rows = "\n".join(
        f"| {name} | {runs[lo]['stages'][name]['rows']} | "
        f"{per_doc[name]} | "
        f"{runs[lo]['stages'][name]['wall_ms'] / 1000:.1f} | "
        f"{runs[hi]['stages'][name]['wall_ms'] / 1000:.1f} |"
        for name in runs[lo]["stages"]
    )
    common = f"""| stage | rows | rows/doc | local[{lo}] wall (s) | local[{hi}] wall (s) |
|---|---|---|---|---|
{stage_rows}

- end-to-end: local[{lo}] {runs[lo]['wall_s']}s
  ({tp[lo]:,.0f} docs/s) -> local[{hi}] {runs[hi]['wall_s']}s
  ({tp[hi]:,.0f} docs/s); scaling efficiency **{eff}**
  (read against the measured raw-CPU ceiling for 8->32 on this VM —
  see the scaling-evidence table above; the VM throttles above ~16-22
  busy cores).
- final corpus: {runs[lo]['n_corpus']:,} docs; checksum-identical
  across levels (order-insensitive crc32 over (doc_id, md5(text)))."""
    if ADVERSARIAL:
        md = f"""## Adversarial skew stress ({N_DOCS:,} docs: megacluster + Zipf sites)

The skew-hostile corpus (`scripts/dedup_stress.py --adversarial`): a
{MEGA_EXACT:,}-member EXACT-duplicate megacluster, a {MEGA_NEAR:,}-member
NEAR-duplicate megacluster (each member one word off a shared seed),
Zipf-distributed site sizes (hot boilerplate keys), plus the base
planted near/exact-dup clusters. Same staged chain, same protocol
(pinned levels, fresh JVM, run alone).

{common}
- the run ASSERTS linearity: every stage's output rows <= 3N (the
  rows/doc column holds the measured constants); minhash signatures
  cover at most N - {MEGA_EXACT:,} + 1 docs (the exact pre-collapse
  stage reduced the megacluster to one representative before any
  shingle exploded); LSH candidate pairs <= 1.0N — the near-dup
  megacluster's ~{MEGA_NEAR // 1000}k-member buckets emit O(B) min-id
  star edges (lshpairs.BUCKET_PAIR_CAP), where the uncapped self-join
  would emit ~{MEGA_NEAR * (MEGA_NEAR - 1) // 2 // 1_000_000}M pairs
  from those buckets alone.

Generated by `scripts/dedup_stress.py --adversarial`.
"""
        marker = "## Adversarial skew stress"
    else:
        md = f"""## Composed dedup-pipeline stress ({N_DOCS:,} docs)

One staged job (`pipeline.run_curation_staged`): exact pre-collapse ->
minhash sig (representatives only) -> LSH pairs -> connected
components -> canonical corpus -> decontaminate -> boilerplate scrub
-> quality-gated final corpus, every stage materialized to parquet
with a lineage row (the multi-day-production checkpoint shape).
Corpus: {N_DOCS:,} planted-structure docs (`scripts/dedup_stress.py`
docstring — 15% near/exact dup members, per-site boilerplate, planted
benchmark contamination). Chain is pure JVM (no Python UDF workers);
levels pinned, fresh JVM, run alone.

{common}
- every stage's output is O(corpus) (rows/doc column): components
  cover only pair members, kill-lists broadcast — no stage
  materializes anything super-linear.

Generated by `scripts/dedup_stress.py`.
"""
        marker = "## Composed dedup-pipeline stress"
    bench_path = os.path.join(REPO, "BENCH.md")
    prev = open(bench_path).read()
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
