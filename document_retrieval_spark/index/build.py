"""Resumable distributed index build with per-partition checkpoints, lineage
and metrics (SURVEY.md §7 M4; north_rule: "resumable from per-partition
checkpoints with lineage and metrics (postings written, bytes, skew ratio)").

This is the engineered successor of the reference's `os.path.exists(...)`
materialized-DAG resume (`cosine_similarity_bm25_reranking.py:288-330`,
`bm25_ranking.ipynb cell 4:10-17,36-58`) and of its hand-sharded pickle store
(`save_in_batches`, `final_implementation.py:187-220`): every stage writes a
parquet table plus a `_manifest.json` recording row counts, bytes, wall time,
input lineage and config; a stage is skipped on re-run iff its manifest is
present and matches the current config fingerprint.

Stage DAG (each independently resumable):

  docs      transcripts -> assembled+tokenized docs (docid, dl, n_turns, ts range)
  doc_map   dense doc ordinals (docid, doc_ord, dl)
  tf        long-form (term, docid, doc_ord, tf, dl), PARTITIONED BY shard_group
  stats     collection stats (n_docs, avgdl) + term stats (term, df, idf)
  postings/group=G   encoded posting segments, one job per shard group G
                     (partition-pruned read of tf) — the per-partition
                     checkpoint unit; FAULT_AFTER_SHARD injects a crash after
                     group N for the resume test (FIXTURES.md §5)

Why shard groups: re-running one failed group re-reads ONLY tf partitions with
that shard_group (parquet partition pruning), so recovery cost is
O(1/n_shard_groups) of the build, not a full re-scan.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..sources.fs import fs_for, read_json, write_json_atomic
from ..operators.assemble import assemble_documents
from ..operators.postings import assign_doc_ordinals, build_postings
from ..operators.stats import (
    build_term_dictionary,
    build_term_stats,
    collection_stats,
    term_frequencies,
    term_frequencies_from_turns,
    tokenize_documents,
)

MANIFEST = "_manifest.json"
PENDING = "_compact_pending"
CURRENT = "CURRENT.json"
# versions retained after a flip: the new current plus this many
# predecessors — an in-flight reader resolved against version N keeps
# working through the compaction that publishes N+1; readers more than
# RETAIN_VERSIONS compactions behind are out of contract (documented)
RETAIN_VERSIONS = 1


class IndexBuilder:
    def __init__(self, spark: SparkSession, cfg: EngineConfig, out_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.out = out_dir.rstrip("/")
        # every manifest/commit file op goes through the FS abstraction
        # (sources/fs.py): plain paths -> os/shutil, URI schemes
        # (hdfs://, file://, s3a://, ...) -> Hadoop FileSystem via the
        # session JVM — the same FS Spark's parquet writers use. See the
        # module docs for the S3 rename-atomicity caveat.
        self.fs = fs_for(spark, self.out)
        self.fs.makedirs(self.out)
        # version the rebuilt-family paths resolve against; build()/compact()
        # re-point this at the run's target version
        self._ver = max(1, int(self._pointer()["version"]))

    # ---------- checkpoint plumbing ----------

    def _fingerprint(self) -> dict:
        c = self.cfg
        return {
            "tokenizer": vars(c.tokenizer) | {"stopwords": sorted(c.tokenizer.stopwords)},
            "bm25": vars(c.bm25),
            "index": vars(c.index),
        }

    # ---- MVCC for the REBUILT stage family (stats + postings) ----
    # docs/doc_map/tf/vocab are append-only: an in-flight reader's captured
    # file listing stays valid across a compaction. stats and postings are
    # REBUILT by compaction, so they live under versioned dirs
    # (stats/v=N/..., postings/v=N/group=G) with a CURRENT.json pointer:
    # readers resolve the pointer once at load_index() and keep reading
    # their version's immutable files while a rebuild writes v=N+1 aside
    # and flips the pointer atomically (write_text_atomic). Old versions
    # are reclaimed RETAIN_VERSIONS flips later.
    _VERSIONED = ("stats", "postings")

    def _pointer(self) -> dict:
        return read_json(self.fs, os.path.join(self.out, CURRENT)) or {
            "version": 0, "stale": False,
        }

    def _write_pointer(self, version: int, stale: bool) -> None:
        write_json_atomic(
            self.fs, os.path.join(self.out, CURRENT),
            {"version": version, "stale": stale},
        )

    def _family_complete(self, ver: int) -> bool:
        old = self._ver
        self._ver = ver
        try:
            return self._complete("stats") and all(
                self._complete(f"postings/group={g}")
                for g in range(self.cfg.index.n_shard_groups)
            )
        finally:
            self._ver = old

    def _resolve_target_ver(self) -> int:
        """Version the rebuilt family should target this run: the current
        one when it is complete under this fingerprint and not stale
        (everything skips), else the next (write-aside; resume naturally
        reuses its partial manifests)."""
        ptr = self._pointer()
        cur = int(ptr["version"])
        if cur == 0:
            return 1
        if not ptr.get("stale") and self._family_complete(cur):
            return cur
        return cur + 1

    def _mark_stale(self) -> None:
        """A compaction changed tf/stats inputs: the published version no
        longer matches the appended corpus. Mark the pointer stale (the
        next build targets cur+1) and discard any PARTIAL next-version
        work — its manifests would pass the config-fingerprint check but
        were computed from the pre-append inputs."""
        ptr = self._pointer()
        cur = int(ptr["version"])
        if cur == 0:
            return
        for fam in self._VERSIONED:
            self.fs.rmtree(f"{self.out}/{fam}/v={cur + 1}")
        self._write_pointer(cur, stale=True)

    def _publish(self, ver: int) -> None:
        """Atomic pointer flip + reclamation of versions older than the
        retention window."""
        ptr = self._pointer()
        if int(ptr["version"]) != ver or ptr.get("stale"):
            self._write_pointer(ver, stale=False)
        for fam in self._VERSIONED:
            base = f"{self.out}/{fam}"
            for d in self.fs.listdir(base):
                if d.startswith("v="):
                    try:
                        v = int(d[2:])
                    except ValueError:
                        continue
                    if v < ver - RETAIN_VERSIONS:
                        self.fs.rmtree(os.path.join(base, d))

    def _path(self, stage: str) -> str:
        for fam in self._VERSIONED:
            if stage == fam or stage.startswith(fam + "/"):
                rest = stage[len(fam):]
                return f"{self.out}/{fam}/v={self._ver}{rest}"
        return f"{self.out}/{stage}"

    def _complete(self, stage: str) -> bool:
        m = read_json(self.fs, os.path.join(self._path(stage), MANIFEST))
        return m is not None and m.get("fingerprint") == self._fingerprint()

    def _write_manifest(self, stage: str, t0: float, extra: dict, inputs: list[str]):
        path = self._path(stage)
        man = {
            "stage": stage,
            "fingerprint": self._fingerprint(),
            "inputs": inputs,
            "wall_sec": round(time.time() - t0, 3),
            "bytes": self.fs.dir_bytes(path),
            **extra,
        }
        write_json_atomic(self.fs, os.path.join(path, MANIFEST), man)
        return man

    def manifest(self, stage: str) -> dict | None:
        return read_json(self.fs, os.path.join(self._path(stage), MANIFEST))

    # ---------- stages ----------

    def _drop_stale_groups(self):
        """Remove postings/group=G dirs with G >= n_shard_groups: if the group
        count was reduced between builds on the same out_dir, the rebuild never
        overwrites them and load_index's partition discovery would read stale
        segments into query results."""
        base = self._path("postings")
        live = {f"group={g}" for g in range(self.cfg.index.n_shard_groups)}
        for d in self.fs.listdir(base):
            if d.startswith("group=") and d not in live:
                self.fs.rmtree(os.path.join(base, d))

    def build(self, transcripts: DataFrame) -> dict:
        """Run all stages (skipping completed ones); returns the build report
        with per-stage manifests + skipped flags.

        Stage metrics come from ``df.observe()`` ON THE WRITE ACTION itself —
        the previous design re-read every stage's parquet output just to
        count rows, doubling read IO per stage (and, locally, adding a whole
        job of scheduler floor per stage). With ``lang_col`` set
        (IndexConfig.lang_col) every stage is language-keyed and postings are
        additionally partitioned by language — the reference's
        one-model-per-language layout (`final_implementation.py:300-326`).
        """
        from pyspark.sql import Observation

        lang = self.cfg.index.lang_col
        report: dict = {"stages": {}, "skipped": []}
        self._recover_pending()
        # target version AFTER recovery (a rolled-forward compaction marks
        # the pointer stale, which moves the target to the next version)
        self._ver = self._resolve_target_ver()
        self._drop_stale_groups()

        # Tokenization strategy, ONE tokenize pass either way:
        # - fast path (non-bigram configs): TURN-LOCAL tokenize -> one-shuffle
        #   tf (term_frequencies_from_turns). The raw conversation text never
        #   shuffles, no token arrays are cached — only the collapsed
        #   (docid, term, tf) long form persists; doc lengths derive from it
        #   (dl = sum of tf, the reference's own A5 definition) and the docs
        #   stage becomes a text-free metadata aggregate.
        # - bigram configs: bigrams span turn boundaries, so assemble +
        #   tokenize the full documents and share that frame between stages.
        turn_local = not self.cfg.tokenizer.bigrams
        use_dict = self.cfg.index.term_dict and turn_local
        docs_tok: DataFrame | None = None
        tf_raw: DataFrame | None = None

        def get_docs_tok() -> DataFrame:
            nonlocal docs_tok
            if docs_tok is None:
                docs_tok = tokenize_documents(
                    assemble_documents(transcripts, lang_col=lang),
                    self.cfg.tokenizer,
                ).persist()
            return docs_tok

        # ---- vocab stage (term dictionary, IndexConfig.term_dict): the tf
        # group-by below then keys/carries int64 term_id instead of the
        # term string; compact() appends ids for genuinely-new terms, so
        # incremental builds never re-derive the dictionary.
        if use_dict:
            if not self._complete("vocab"):
                t0 = time.time()
                obs = Observation()
                build_term_dictionary(
                    transcripts, self.cfg.tokenizer, lang_col=lang
                ).observe(obs, F.count(F.lit(1)).alias("terms")).write.mode(
                    "overwrite"
                ).parquet(self._path("vocab"))
                report["stages"]["vocab"] = self._write_manifest(
                    "vocab", t0, {"terms": obs.get["terms"]},
                    ["<input transcripts>"],
                )
            else:
                report["skipped"].append("vocab")

        def get_tdict() -> DataFrame:
            return self.spark.read.parquet(self._path("vocab"))

        def get_tf_raw() -> DataFrame:
            nonlocal tf_raw
            if tf_raw is None:
                tf_raw = term_frequencies_from_turns(
                    transcripts, self.cfg.tokenizer, lang_col=lang,
                    term_dict=get_tdict() if use_dict else None,
                ).persist()
            return tf_raw

        doc_cols = ["docid", "dl", "n_turns", "first_ts", "last_ts"] + (
            [lang] if lang else []
        )
        if not self._complete("docs"):
            t0 = time.time()
            if turn_local:
                keys = ["conv_id"] + ([lang] if lang else [])
                meta = (
                    transcripts.groupBy(*keys)
                    .agg(
                        F.count("*").alias("n_turns"),
                        F.min("ts").alias("first_ts"),
                        F.max("ts").alias("last_ts"),
                    )
                    .withColumnRenamed("conv_id", "docid")
                )
                dls = get_tf_raw().groupBy("docid").agg(
                    F.sum("tf").cast("int").alias("dl")
                )
                docs_src = meta.join(dls, "docid", "left").na.fill({"dl": 0})
            else:
                docs_src = get_docs_tok()
            obs = Observation()
            docs_src.select(*doc_cols).observe(
                obs, F.count(F.lit(1)).alias("rows")
            ).write.mode("overwrite").parquet(self._path("docs"))
            report["stages"]["docs"] = self._write_manifest(
                "docs", t0, {"rows": obs.get["rows"]}, ["<input transcripts>"]
            )
        else:
            report["skipped"].append("docs")

        if not self._complete("doc_map"):
            t0 = time.time()
            src = (
                get_docs_tok()
                if docs_tok is not None
                else self.spark.read.parquet(self._path("docs"))
            )
            doc_map = assign_doc_ordinals(src.select("docid", "dl"))
            obs = Observation()
            doc_map.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "overwrite"
            ).parquet(self._path("doc_map"))
            report["stages"]["doc_map"] = self._write_manifest(
                "doc_map", t0, {"rows": obs.get["rows"]}, [self._path("docs")]
            )
        else:
            report["skipped"].append("doc_map")

        if not self._complete("tf"):
            t0 = time.time()
            if turn_local:
                tf = get_tf_raw()
            else:
                tf = term_frequencies(get_docs_tok(), lang_col=lang)
            doc_map = self.spark.read.parquet(self._path("doc_map"))
            g = self.cfg.index.n_shard_groups
            tf_part = tf.join(doc_map.select("docid", "doc_ord", "dl"), "docid")
            if use_dict:
                # the string column re-attaches AFTER the group-by shuffle
                # (broadcast map-side join over the int tf) so the persisted
                # tf keeps the `term` API boundary for the exhaustive
                # scorer; the postings stage column-prunes it away
                tf_part = tf_part.join(
                    F.broadcast(get_tdict().select("term", "term_id")),
                    "term_id",
                )
            tf_part = tf_part.withColumn(
                "shard_group", F.pmod(F.xxhash64("term"), F.lit(g)).cast("int")
            )
            obs = Observation()
            tf_part.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "overwrite"
            ).partitionBy("shard_group").parquet(self._path("tf"))
            report["stages"]["tf"] = self._write_manifest(
                "tf", t0, {"rows": obs.get["rows"]},
                ["<input transcripts>", self._path("doc_map")],
            )
        else:
            report["skipped"].append("tf")

        if not self._complete("stats"):
            t0 = time.time()
            docs = self.spark.read.parquet(self._path("docs"))
            tf = self.spark.read.parquet(self._path("tf"))
            coll = collection_stats(docs, lang_col=lang)
            term_key = "term_id" if use_dict else "term"
            stats = build_term_stats(
                tf.select(term_key, "docid", *([lang] if lang else [])),
                coll,
                lang_col=lang,
                # the persisted idf (and the idf baked into postings) must
                # follow the configured BM25 variant: an index built with
                # idf_plus_one=False (variants 3/5) would otherwise silently
                # persist variant-1 ln(1+ratio) while the manifest fingerprint
                # claims otherwise
                idf_plus_one=self.cfg.bm25.idf_plus_one,
                term_col=term_key,
            )
            if use_dict:
                # vocab-sized broadcast join restores the string boundary in
                # the persisted stats (term AND term_id: build_postings'
                # has-id branch shuffles on the id, queries join the string)
                stats = stats.join(
                    F.broadcast(get_tdict().select("term", "term_id")),
                    "term_id",
                )
            coll.write.mode("overwrite").parquet(self._path("stats/coll"))
            obs = Observation()
            stats.observe(obs, F.count(F.lit(1)).alias("terms")).write.mode(
                "overwrite"
            ).parquet(self._path("stats/terms"))
            report["stages"]["stats"] = self._write_manifest(
                "stats", t0, {"terms": obs.get["terms"]},
                [self._path("docs"), self._path("tf")],
            )
        else:
            report["skipped"].append("stats")

        if docs_tok is not None:
            docs_tok.unpersist()
        if tf_raw is not None:
            tf_raw.unpersist()

        fault_after = int(os.environ.get("FAULT_AFTER_SHARD", "-1"))
        stats_b = self.spark.read.parquet(self._path("stats/terms"))
        # avgdl collected ONCE from the tiny coll table (one row per
        # language) instead of letting each shard group's build_postings
        # re-derive it from stats/terms
        coll_rows = self.spark.read.parquet(self._path("stats/coll")).collect()
        avgdl_by = (
            {r[lang]: float(r["avgdl"]) for r in coll_rows}
            if lang
            else {None: float(coll_rows[0]["avgdl"])}
        )
        tf_cols = (["term_id"] if use_dict else ["term"]) + (
            ["docid", "doc_ord", "tf", "dl"] + ([lang] if lang else [])
        )
        for g in range(self.cfg.index.n_shard_groups):
            stage = f"postings/group={g}"
            if self._complete(stage):
                report["skipped"].append(stage)
                continue
            t0 = time.time()
            tf_g = self.spark.read.parquet(self._path("tf")).filter(
                F.col("shard_group") == g
            )
            postings = build_postings(
                tf_g.select(*tf_cols),
                stats_b,
                self.cfg.index,
                self.cfg.bm25,
                lang_col=lang,
                avgdl_by_lang=avgdl_by,
            )
            # metrics observed on the write — no re-read; terms counted
            # exactly as sum(seg_id == 0) (one zeroth segment per term, so no
            # distinct aggregate, which observe() disallows)
            obs = Observation()
            observed = postings.observe(
                obs,
                F.count(F.lit(1)).alias("segments"),
                F.sum("n_postings").alias("postings"),
                F.sum(F.when(F.col("seg_id") == 0, 1).otherwise(0)).alias("terms"),
                F.max("df").alias("max_df"),
                F.expr("percentile_approx(df, 0.5)").alias("median_df"),
            )
            w = observed.write.mode("overwrite")
            if lang:
                w = w.partitionBy(lang)
            w.parquet(self._path(stage))
            agg = obs.get
            skew = float(agg["max_df"] or 0) / max(float(agg["median_df"] or 1), 1.0)
            report["stages"][stage] = self._write_manifest(
                stage,
                t0,
                {
                    "postings_written": int(agg["postings"] or 0),
                    "segments": int(agg["segments"]),
                    "terms": int(agg["terms"] or 0),
                    "max_df": int(agg["max_df"] or 0),
                    "skew_ratio": round(skew, 2),
                },
                [self._path("tf"), self._path("stats/terms")],
            )
            if fault_after == g:
                raise RuntimeError(
                    f"FAULT_AFTER_SHARD={g}: injected failure after shard group {g}"
                )

        return self._rollup(report)

    def compact(self, staged_turns: DataFrame) -> dict:
        """Fold streamed-in transcripts into the persisted index — the batch
        half of the lambda promised by streaming/ingest.py: the stream keeps
        appending raw turns to a staging table (streaming.stage_turns);
        this job periodically merges them.

        Incremental work (proportional to the DELTA):
          - assemble+tokenize only the staged conversations,
          - docs / doc_map / tf stages are APPENDED (new doc ordinals
            continue after the current max, preserving uniqueness+density),
          - conversations already indexed are dropped (anti-join on docid) —
            the staging contract is complete conversations (the streaming
            assembler's session-window watermark provides exactly that).

        Rebuilt work (REQUIRED for correctness, proportional to the index,
        not the corpus text): stats and postings — N, df, idf and therefore
        every segment's idf column change globally when documents arrive, so
        the encode pass re-runs from the (cheap, already-tokenized) tf table.
        Tokenization — the dominant cost at transcript scale — never re-runs.

        Note on ordering: appended ordinals are NOT docid-sorted across the
        old/new boundary, so an exact-score TIE may rank in arrival order
        rather than docid order (scores themselves are identical to a cold
        rebuild; tests/test_compaction.py asserts result equality on a
        tie-free corpus).

        Crash consistency: the three appends are staged under
        `_compact_pending/` and applied only after an atomically-renamed
        COMMIT.json lands (write-ahead commit). A crash before the marker
        rolls BACK (live table untouched, the staged conversations are
        re-detected next run); a crash after it rolls FORWARD on the next
        build()/compact() (file moves are idempotent). Without this, a crash
        between the docs append and the doc_map/tf appends would leave
        orphan docs rows that the anti-join then treats as already indexed —
        silently unsearchable forever.
        """
        from pyspark.sql import Observation

        lang = self.cfg.index.lang_col
        use_dict = self.cfg.index.term_dict and not self.cfg.tokenizer.bigrams
        self._recover_pending()
        # stats/postings may be legitimately invalidated (a rolled-forward
        # compaction rebuilds them below); only the append targets must exist
        append_stages = ("docs", "doc_map", "tf") + (("vocab",) if use_dict else ())
        for stage in append_stages:
            if not self._complete(stage):
                raise ValueError(
                    f"compact() requires a completed build (stage {stage!r} "
                    "is missing/stale); run build() first"
                )
        report: dict = {"stages": {}, "skipped": []}

        # materialize the delta ONCE to a staging table, severing its lineage
        # from the docs path: applying the commit refreshes that path's file
        # listing, which would otherwise invalidate this plan's cache and
        # re-run the anti-join against the already-appended rows (dropping
        # every new doc). IO cost is one write+read of the DELTA only.
        existing = self.spark.read.parquet(self._path("docs"))
        delta_path = self._path("_compact_delta")
        tokenize_documents(
            assemble_documents(staged_turns, lang_col=lang), self.cfg.tokenizer
        ).join(existing.select("docid"), "docid", "left_anti").write.mode(
            "overwrite"
        ).parquet(delta_path)
        self.spark.catalog.refreshByPath(delta_path)
        docs_tok = self.spark.read.parquet(delta_path)

        pending = self._path(PENDING)
        self.fs.rmtree(pending)
        doc_cols = ["docid", "dl", "n_turns", "first_ts", "last_ts"] + (
            [lang] if lang else []
        )
        # ---- stage the three appends under pending/ (live table untouched)
        obs = Observation()
        docs_tok.select(*doc_cols).observe(
            obs, F.count(F.lit(1)).alias("rows")
        ).write.mode("overwrite").parquet(f"{pending}/docs")
        n_new = obs.get["rows"]

        base = self.spark.read.parquet(self._path("doc_map")).agg(
            F.coalesce(F.max("doc_ord") + 1, F.lit(0)).alias("b")
        ).collect()[0]["b"]
        assign_doc_ordinals(docs_tok.select("docid", "dl")).withColumn(
            "doc_ord", F.col("doc_ord") + F.lit(int(base))
        ).write.mode("overwrite").parquet(f"{pending}/doc_map")

        tf_new = term_frequencies(docs_tok, lang_col=lang)
        n_vocab_new = 0
        if use_dict:
            # EXTEND the dictionary: genuinely-new terms get dense ids
            # continuing after the current max (uniqueness + density
            # preserved); existing terms keep their ids, so old postings/tf
            # rows never re-map. This is what makes the vocab pass a
            # one-time cost amortized across incremental builds.
            from ..operators.ordinals import dense_rank_ordinals

            dict_keys = ["term"] + ([lang] if lang else [])
            tdict_old = self.spark.read.parquet(self._path("vocab"))
            base_id = int(
                tdict_old.agg(
                    F.coalesce(F.max("term_id") + 1, F.lit(0)).alias("b")
                ).collect()[0]["b"]
            )
            new_terms = (
                tf_new.select(*dict_keys)
                .distinct()
                .join(tdict_old.select(*dict_keys), dict_keys, "left_anti")
            )
            obs = Observation()
            dense_rank_ordinals(new_terms, dict_keys, "term_id").withColumn(
                "term_id", F.col("term_id") + F.lit(base_id)
            ).observe(obs, F.count(F.lit(1)).alias("terms")).write.mode(
                "overwrite"
            ).parquet(f"{pending}/vocab")
            n_vocab_new = obs.get["terms"]
            tdict_all = tdict_old.unionByName(
                self.spark.read.parquet(f"{pending}/vocab")
            )
            tf_new = tf_new.join(
                F.broadcast(tdict_all.select(*dict_keys, "term_id")), dict_keys
            )
        g = self.cfg.index.n_shard_groups
        new_map = self.spark.read.parquet(f"{pending}/doc_map")
        tf_part = tf_new.join(
            new_map.select("docid", "doc_ord", "dl"), "docid"
        ).withColumn(
            "shard_group", F.pmod(F.xxhash64("term"), F.lit(g)).cast("int")
        )
        obs = Observation()
        tf_part.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).partitionBy("shard_group").parquet(f"{pending}/tf")
        n_tf = obs.get["rows"]

        # ---- write-ahead commit record: file moves + updated manifests +
        # the downstream manifests to invalidate, applied as one recovery-
        # replayable unit
        moves = []
        for stage in append_stages:
            src_base = os.path.join(pending, stage)
            for rel in self.fs.walk_files(src_base):
                if os.path.basename(rel).startswith(("_", ".")):
                    continue
                moves.append(
                    [os.path.join(PENDING, stage, rel), os.path.join(stage, rel)]
                )
        olds = {s: (self.manifest(s) or {}) for s in ("docs", "doc_map", "tf")}
        commit = {
            "moves": moves,
            "manifests": {
                "docs": {
                    "extra": {"rows": olds["docs"].get("rows", 0) + n_new,
                              "appended": n_new},
                    "inputs": ["<staged transcripts>"],
                },
                "doc_map": {
                    "extra": {"rows": olds["doc_map"].get("rows", 0) + n_new,
                              "appended": n_new},
                    "inputs": [self._path("docs")],
                },
                "tf": {
                    "extra": {"rows": olds["tf"].get("rows", 0) + n_tf,
                              "appended": n_tf},
                    "inputs": ["<staged transcripts>", self._path("doc_map")],
                },
                **(
                    {
                        "vocab": {
                            "extra": {
                                "terms": (self.manifest("vocab") or {}).get(
                                    "terms", 0
                                )
                                + n_vocab_new,
                                "appended": n_vocab_new,
                            },
                            "inputs": ["<staged transcripts>"],
                        }
                    }
                    if use_dict
                    else {}
                ),
            },
            "invalidate": ["stats"]
            + [f"postings/group={i}" for i in range(g)],
        }
        # atomic-write = tmp + rename (fs-provided; see fs.py S3 caveat)
        write_json_atomic(
            self.fs, os.path.join(pending, "COMMIT.json"), commit
        )  # commit point
        self._apply_commit(commit)
        self.fs.rmtree(delta_path)
        for s in append_stages:
            report["stages"][s] = self.manifest(s)

        # rebuild the global stages via build()'s stats+postings path
        # (docs/doc_map/tf are complete, so build() skips them and never
        # touches the `transcripts` argument)
        rebuilt = self.build(self.spark.createDataFrame([], "conv_id string"))
        report["stages"].update(rebuilt["stages"])
        report["total"] = rebuilt["total"]
        return report

    def _apply_commit(self, commit: dict) -> None:
        """Apply (or re-apply during recovery) a staged compaction: move the
        pending files into the live stage dirs (idempotent: a src missing
        means that move already happened), invalidate downstream manifests,
        write the updated stage manifests, drop the staging dir."""
        for src_rel, dst_rel in commit["moves"]:
            src = os.path.join(self.out, src_rel)
            dst = os.path.join(self.out, dst_rel)
            if self.fs.exists(src):
                self.fs.rename(src, dst)
        # `invalidate` (stats + postings) is honored by MARKING THE POINTER
        # STALE instead of deleting the published version's manifests: the
        # published stats/postings files stay on disk untouched, so readers
        # that resolved them before this compaction finish correctly; the
        # next build() targets version+1 and flips the pointer when done
        if commit.get("invalidate"):
            self._mark_stale()
        t0 = time.time()
        for stage, m in commit["manifests"].items():
            self._write_manifest(stage, t0, m["extra"], m["inputs"])
            # the listing of an appended path changed; drop the session's
            # cached file index
            self.spark.catalog.refreshByPath(self._path(stage))
        self.fs.rmtree(self._path(PENDING))

    def _recover_pending(self) -> None:
        """Crash recovery for compact(): roll a half-applied compaction
        FORWARD if its COMMIT.json landed, otherwise roll BACK by discarding
        the staging dirs (the live table was never touched)."""
        pending = self._path(PENDING)
        marker = read_json(self.fs, os.path.join(pending, "COMMIT.json"))
        if marker is not None:
            self._apply_commit(marker)
        elif self.fs.exists(pending):
            self.fs.rmtree(pending)
        self.fs.rmtree(self._path("_compact_delta"))

    def _rollup(self, report: dict) -> dict:
        # roll-up manifest
        groups = [self.manifest(f"postings/group={g}") for g in
                  range(self.cfg.index.n_shard_groups)]
        total = {
            "postings_written": sum(m["postings_written"] for m in groups),
            "bytes": sum(m["bytes"] for m in groups),
            "skew_ratio": max(m["skew_ratio"] for m in groups),
            "n_groups": len(groups),
        }
        write_json_atomic(
            self.fs,
            os.path.join(self.out, MANIFEST),
            {"fingerprint": self._fingerprint(), **total},
        )
        # publish: atomic pointer flip to this run's version + reclaim
        # versions past the retention window
        self._publish(self._ver)
        report["total"] = total
        return report


def _current_postings_dir(out_dir: str) -> str:
    """Resolve the published version's postings dir (local paths; used by
    tests/tools that inspect the physical layout)."""
    out = out_dir.rstrip("/")
    p = os.path.join(out, CURRENT)
    if os.path.exists(p):
        with open(p) as f:
            v = int(json.load(f).get("version", 0))
        if v > 0:
            return os.path.join(out, "postings", f"v={v}")
    return os.path.join(out, "postings")


@dataclass
class LoadedIndex:
    postings: DataFrame
    doc_map: DataFrame
    coll: DataFrame
    term_stats: DataFrame
    # the staged long-form tf table (S7): the exhaustive scorer's input —
    # the only scorer valid for variant-3/5 indexes (negative idf)
    tf: DataFrame | None = None
    # root _manifest.json (config fingerprint incl. the BM25 variant the
    # index was built with); None for indexes predating the manifest
    manifest: dict | None = None

    @property
    def bm25_fingerprint(self) -> dict:
        return (self.manifest or {}).get("fingerprint", {}).get("bm25", {})


def load_index(spark: SparkSession, out_dir: str) -> LoadedIndex:
    """Load a persisted index. The rebuilt stage family (stats, postings)
    resolves through the CURRENT.json version pointer ONCE, here: the
    returned DataFrames keep reading that version's immutable files even
    while a concurrent compaction writes the next version aside and flips
    the pointer (tests/test_compaction.py read-during-compact). The
    append-only tables (doc_map, tf) are read live — appended docs never
    appear in this version's postings, so results stay consistent."""
    out = out_dir.rstrip("/")
    fs = fs_for(spark, out)
    manifest = read_json(fs, os.path.join(out, MANIFEST))
    ptr = read_json(fs, os.path.join(out, CURRENT))
    if ptr is not None and int(ptr.get("version", 0)) > 0:
        v = int(ptr["version"])
        postings_path = f"{out}/postings/v={v}"
        stats_base = f"{out}/stats/v={v}"
    else:  # legacy unversioned layout
        postings_path = f"{out}/postings"
        stats_base = f"{out}/stats"
    tf = None
    if fs.exists(f"{out}/tf"):
        tf = spark.read.parquet(f"{out}/tf")
    return LoadedIndex(
        postings=spark.read.parquet(postings_path),
        doc_map=spark.read.parquet(f"{out}/doc_map"),
        coll=spark.read.parquet(f"{stats_base}/coll"),
        term_stats=spark.read.parquet(f"{stats_base}/terms"),
        tf=tf,
        manifest=manifest,
    )
