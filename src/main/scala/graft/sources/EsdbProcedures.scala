package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.{EsdbWriter, Publish}

/** Maintenance operations as SQL stored procedures —
  * `CALL cat.system.compact(table => 't')` etc. — so a SQL-only user
  * can run the store's whole lifecycle (compaction, retention sweeps,
  * sealing) without the Scala API. Each returns a one-row result
  * confirming what happened; the work itself is the same engine
  * method the DataFrame surface calls.
  */
object EsdbProcedures {

  val names: Seq[String] =
    Seq("compact", "compact_incremental", "compact_log", "vacuum", "seal", "rollback",
      "update_where", "merge_keyed", "apply_changes", "set_policy", "maintain",
      "maintain_all", "clone_table", "build_vector_index", "vector_search")

  private def p(name: String, dt: org.apache.spark.sql.types.DataType,
                default: Option[String] = None,
                comment: String = ""): ProcedureParameter = {
    var b = ProcedureParameter.in(name, dt)
    default.foreach(d => b = b.defaultValue(d))
    if (comment.nonEmpty) b = b.comment(comment)
    b.build()
  }

  def load(which: String, root: String, conf: () => Configuration): UnboundProcedure = {
    def path(table: String): String = (root +: table.split('.').toSeq).mkString("/")
    def version(table: String): Long =
      Publish.currentVersionNumber(conf(), path(table)).getOrElse(0L)
    // the widest declared retention wins ANYWHERE versions are swept: a
    // CDC-marked table (`_CDC` records its window) must not lose feed
    // history to a compact/vacuum CALL with a narrower keep_versions —
    // the same rule maintain() applies
    def effKeep(table: String, requested: Int): Int =
      math.max(requested,
        EsdbWriter.cdcKeepVersions(conf(), path(table)).getOrElse(1))
    which match {
      case "compact" => proc("compact",
        Seq(p("table", StringType),
          p("keep_versions", IntegerType, Some("1")),
          p("subparts", IntegerType, Some("0"),
            comment = "re-bucket every space into this many grouping-hash " +
              "subpartitions (0 = keep the current count) — layout evolution " +
              "for a store that outgrew its creation-time write parallelism"),
          p("cluster_chunks", IntegerType, Some("0"),
            comment = "rescale the clustering chunk count (0 = keep current)")),
        StructType(Seq(StructField("table", StringType), StructField("version", LongType))),
        "full compaction: rewrite the store as one sorted file set per space, publish as a new version") { in =>
        val t = in.getUTF8String(0).toString
        EsdbWriter.compact(SparkSession.active, path(t), effKeep(t, in.getInt(1)),
          subparts = Some(in.getInt(2)).filter(_ > 0),
          clusterChunks = Some(in.getInt(3)).filter(_ > 0))
        Seq(row(UTF8String.fromString(t), version(t)))
      }
      case "compact_incremental" => proc("compact_incremental",
        Seq(p("table", StringType),
          p("max_files_per_space", IntegerType, Some("4")),
          p("keep_versions", IntegerType, Some("1"))),
        StructType(Seq(StructField("table", StringType),
          StructField("published", BooleanType), StructField("version", LongType))),
        "rewrite only spaces fragmented past the threshold; carry the rest") { in =>
        val t = in.getUTF8String(0).toString
        val published = EsdbWriter.compactIncremental(
          SparkSession.active, path(t), in.getInt(1), effKeep(t, in.getInt(2)))
        Seq(row(UTF8String.fromString(t), published, version(t)))
      }
      case "compact_log" => proc("compact_log",
        Seq(p("table", StringType),
          p("num_files", IntegerType, Some("1")),
          p("keep_versions", IntegerType, Some("1"))),
        StructType(Seq(StructField("table", StringType), StructField("version", LongType))),
        "rewrite an append log as num_files sorted files; epoch markers carry") { in =>
        val t = in.getUTF8String(0).toString
        EsdbWriter.compactLog(SparkSession.active, path(t), in.getInt(1), effKeep(t, in.getInt(2)))
        Seq(row(UTF8String.fromString(t), version(t)))
      }
      case "vacuum" => proc("vacuum",
        Seq(p("table", StringType),
          p("keep", IntegerType, Some("1"))),
        StructType(Seq(StructField("table", StringType), StructField("version", LongType))),
        "sweep retired publish versions past the retention window") { in =>
        val t = in.getUTF8String(0).toString
        Publish.vacuum(conf(), path(t), effKeep(t, in.getInt(1)))
        Seq(row(UTF8String.fromString(t), version(t)))
      }
      case "seal" => proc("seal",
        Seq(p("table", StringType),
          p("index_name", StringType)),
        StructType(Seq(StructField("table", StringType), StructField("sealed", BooleanType))),
        "seal the store immutable and write the tails sidecar for the index") { in =>
        val t = in.getUTF8String(0).toString
        // seal the LOGICAL root: the marker must survive version churn
        // and is what every write path's isSealed check consults
        EsdbWriter.seal(SparkSession.active, path(t), in.getUTF8String(1).toString)
        Seq(row(UTF8String.fromString(t), true))
      }
      case "rollback" => proc("rollback",
        Seq(p("table", StringType),
          p("version", LongType, comment = "committed version to restore"),
          p("keep_versions", IntegerType, Some("2"))),
        StructType(Seq(StructField("table", StringType),
          StructField("restored_version", LongType),
          StructField("new_version", LongType))),
        "re-pin the live table to an older committed version (no data copied; history stays monotonic)") { in =>
        val t = in.getUTF8String(0).toString
        val target = in.getLong(1)
        val next = Publish.rollback(conf(), path(t), target, effKeep(t, in.getInt(2)))
        Seq(row(UTF8String.fromString(t), target, next))
      }
      case "update_where" => proc("update_where",
        Seq(p("table", StringType),
          p("set", StringType, comment = "SQL assignment list: col = expr, ..."),
          p("where", StringType, comment = "SQL predicate choosing the rows to update"),
          p("keep_versions", IntegerType, Some("1"))),
        StructType(Seq(StructField("table", StringType),
          StructField("rewritten", BooleanType), StructField("version", LongType))),
        "row-level UPDATE via footer-stats copy-on-write: only files whose stats admit a match rewrite; the rest carry byte-for-byte") { in =>
        val t = in.getUTF8String(0).toString
        val rewrote = UpdateSql.updateWhere(SparkSession.active, path(t),
          in.getUTF8String(1).toString, in.getUTF8String(2).toString,
          effKeep(t, in.getInt(3)))
        Seq(row(UTF8String.fromString(t), rewrote, version(t)))
      }
      case "merge_keyed" => proc("merge_keyed",
        Seq(p("table", StringType),
          p("source", StringType,
            comment = "source rows: a table/view name, or a SELECT query"),
          p("keys", StringType, comment = "comma-separated merge key column(s)"),
          p("keep_versions", IntegerType, Some("1"))),
        StructType(Seq(StructField("table", StringType),
          StructField("replaced", LongType), StructField("inserted", LongType),
          StructField("version", LongType))),
        "keyed MERGE (upsert): target rows matching a source key are replaced, " +
          "unmatched source rows insert; footer stats bound the rewrite footprint") { in =>
        val t = in.getUTF8String(0).toString
        val srcSpec = in.getUTF8String(1).toString.trim
        val spark = SparkSession.active
        // Strings that parse as a multipart identifier are table/view
        // names — resolved with spark.table so genuine lookup failures
        // (typo, metastore error) surface as-is. Everything else must
        // parse as a QUERY before it runs: statements (DDL, INSERT,
        // MERGE, SET, ...) are refused rather than executed as a side
        // effect of being passed where a source belongs.
        val parser = spark.sessionState.sqlParser
        val source = scala.util.Try(parser.parseMultipartIdentifier(srcSpec)) match {
          case scala.util.Success(_) => spark.table(srcSpec)
          case scala.util.Failure(_) =>
            import org.apache.spark.sql.catalyst.plans.logical.{Command, ParsedStatement}
            val plan = parser.parsePlan(srcSpec)
            require(!plan.isInstanceOf[Command] && !plan.isInstanceOf[ParsedStatement],
              s"merge_keyed source must be a table/view name or a query; " +
                s"got a ${plan.nodeName} statement, which merge_keyed refuses to execute")
            spark.sql(srcSpec)
        }
        val keys = in.getUTF8String(2).toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val (replaced, inserted) = EsdbWriter.mergeInto(
          spark, path(t), source, keys, effKeep(t, in.getInt(3)))
        Seq(row(UTF8String.fromString(t), replaced, inserted, version(t)))
      }
      case "apply_changes" => proc("apply_changes",
        Seq(p("table", StringType, comment = "the replica store to apply onto"),
          p("source", StringType, comment = "the followed store (same catalog)"),
          p("since_version", LongType,
            comment = "exclusive lower bound: apply the source's changes after this version"),
          p("keep_versions", IntegerType, Some("2"))),
        StructType(Seq(StructField("table", StringType),
          StructField("inserted", LongType), StructField("deleted", LongType),
          StructField("version", LongType))),
        "CDC apply: drain the source's row-level change feed since a version into the " +
          "replica (multiset-exact, stats-bounded footprint, drift detection)") { in =>
        val t = in.getUTF8String(0).toString
        val src = in.getUTF8String(1).toString
        val spark = SparkSession.active
        val feed = EsdbWriter.changesFeed(spark, path(src), in.getLong(2))
        val (ins, del) = EsdbWriter.applyChanges(spark, path(t), feed,
          effKeep(t, in.getInt(3)))
        Seq(row(UTF8String.fromString(t), ins, del, version(t)))
      }
      case "set_policy" => proc("set_policy",
        Seq(p("table", StringType),
          p("retention_us", LongType, Some("0"),
            comment = "delete events older than now - this (0 = no retention)"),
          p("max_files_per_space", IntegerType, Some("0"),
            comment = "re-compact spaces fragmented past this (0 = no compaction)"),
          p("keep_versions", IntegerType, Some("2")),
          p("recluster_overlap_x100", LongType, Some("0"),
            comment = "re-cluster when a cluster column's overlap factor exceeds " +
              "this/100 — expected files per point lookup (0 = never)")),
        StructType(Seq(StructField("table", StringType), StructField("policy", StringType))),
        "declare the store's maintenance policy (retention / fragmentation / version sweep)") { in =>
        val t = in.getUTF8String(0).toString
        val pol = graft.engine.Maintenance.Policy(
          retentionUs = Some(in.getLong(1)).filter(_ > 0),
          maxFilesPerSpace = Some(in.getInt(2)).filter(_ > 0),
          keepVersions = in.getInt(3),
          reclusterOverlapX100 = Some(in.getLong(4)).filter(_ > 0))
        graft.engine.Maintenance.setPolicy(conf(), path(t), pol)
        Seq(row(UTF8String.fromString(t), UTF8String.fromString(pol.toString)))
      }
      case "maintain" => proc("maintain",
        Seq(p("table", StringType)),
        StructType(Seq(StructField("table", StringType),
          StructField("actions", StringType), StructField("version", LongType))),
        "apply the store's declared policy idempotently: retention, fragmentation " +
          "repair, retired-version vacuum — no-ops when already conforming") { in =>
        val t = in.getUTF8String(0).toString
        val actions = graft.engine.Maintenance.maintain(SparkSession.active, path(t))
        Seq(row(UTF8String.fromString(t),
          UTF8String.fromString(if (actions.isEmpty) "none" else actions.mkString(",")),
          version(t)))
      }
      case "maintain_all" => proc("maintain_all",
        Seq.empty,
        StructType(Seq(StructField("table", StringType),
          StructField("actions", StringType), StructField("version", LongType))),
        "sweep EVERY table under the catalog root and apply each store's declared " +
          "_POLICY — the scheduler entry point: call it blindly on a cadence; " +
          "unmanaged (policy-less) stores are reported and untouched") { _ =>
        val spark = SparkSession.active
        EsdbCatalog.allTables(conf(), root).map { parts =>
          // resolve by PARTS, never by re-splitting a dotted name — a
          // directory name containing '.' must still sweep correctly
          val tp = (root +: parts).mkString("/")
          val label =
            if (graft.engine.Maintenance.policyOf(conf(), tp).isEmpty) "unmanaged"
            else {
              val actions = graft.engine.Maintenance.maintain(spark, tp)
              if (actions.isEmpty) "none" else actions.mkString(",")
            }
          val v = Publish.currentVersion(conf(), tp).map(_._1).getOrElse(0L)
          row(UTF8String.fromString(parts.mkString(".")), UTF8String.fromString(label), v)
        }
      }
      case "build_vector_index" => proc("build_vector_index",
        Seq(p("table", StringType),
          p("attr", StringType, Some("'embedding'"),
            comment = "payload JSON key holding the float-array embedding"),
          p("lists", IntegerType, Some("16")),
          p("recall_target", DoubleType, Some("NULL"),
            comment = "declared recall@10 contract in (0,1]: the build samples " +
              "its own vectors, measures the recall-vs-probes curve against the " +
              "full probe, and stamps the smallest probes meeting the target as " +
              "the index's default operating point. Omitted = keep the contract " +
              "already declared on this attr; an explicit 0 CLEARS it")),
        StructType(Seq(StructField("table", StringType), StructField("attr", StringType),
          StructField("lists", IntegerType), StructField("corpus_version", LongType),
          StructField("default_probes", IntegerType))),
        "build (or refresh) the store's persisted IVF vector index over a payload " +
          "embedding attr (vec_id = event_id) — stamped to the store's publish " +
          "version: a stale index rebuilds, a fresh one no-ops. With " +
          "recall_target, the measured operating point becomes vector_search's " +
          "default probes") { in =>
        val t = in.getUTF8String(0).toString
        val attr = in.getUTF8String(1).toString
        val spark = SparkSession.active
        val idx = vecIndexPathFor(root, t, attr)
        // an OMITTED target (NULL) keeps the contract already declared
        // on this attr's index — re-running the CALL without the
        // argument must never silently discard a recall contract (the
        // setCdc rule: contracts never narrow silently). An EXPLICIT 0
        // clears it: the one API path that removes a contract.
        val target =
          if (in.isNullAt(3))
            graft.ops.Ivf.registeredIndexes(conf(), path(t))
              .find(_.attr == attr).map(_.recallTarget).filter(_ > 0.0)
          else Some(in.getDouble(3)).filter(_ > 0.0)
        graft.ops.Ivf.ensureIndexFor(spark, path(t), idx,
          nLists = in.getInt(2), recallTarget = target)(embeddingOf(attr))
        // declare the index on the store so maintain() keeps it fresh
        // across its own retention/compaction commits — contract
        // included, so a maintain-driven rebuild RE-MEASURES the curve
        graft.ops.Ivf.registerIndex(conf(), path(t),
          graft.ops.Ivf.RegisteredIndex(attr, in.getInt(2), 42L, idx,
            target.getOrElse(0.0)))

        // report what the index IS, not what was requested — one
        // metadata resolution (no cross-version mix under a concurrent
        // rebuild): lists from the params sidecar, with the centroid
        // COUNT as the ground-truth fallback for pre-sidecar indexes;
        // corpus version parsed from the build stamp
        val (idxRoot, stampOpt, paramsOpt) = graft.ops.Ivf.indexMeta(conf(), idx)
        val lists = paramsOpt.map(_._1).getOrElse(
          spark.read.parquet(s"$idxRoot/centroids").count().toInt)
        val stampedVersion = stampOpt
          .flatMap(_.split('/').headOption)
          .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(0L)
        val defProbes = graft.ops.Ivf.defaultProbes(conf(), idx).getOrElse(0)
        Seq(row(UTF8String.fromString(t), UTF8String.fromString(attr),
          lists, stampedVersion, defProbes))
      }
      case "vector_search" => proc("vector_search",
        Seq(p("table", StringType),
          p("query_id", LongType, Some("NULL"),
            comment = "event_id of the probe row ('more like this'); omit when passing query"),
          p("attr", StringType, Some("'embedding'")),
          p("k", IntegerType, Some("10")),
          p("probes", IntegerType, Some("0"),
            comment = "lists to probe; 0 = the index's measured operating point " +
              "(build_vector_index recall_target), or 4 when no contract was declared"),
          p("query", StringType, Some("''"),
            comment = "probe vector as a JSON float array, e.g. '[0.1, -0.2, 0.3]' — " +
              "the fresh-embedding form; mutually exclusive with query_id")),
        StructType(Seq(StructField("neighbor_id", LongType),
          StructField("rank", LongType), StructField("cos_x1e6", LongType))),
        "approximate nearest neighbors of an existing row (query_id) or an " +
          "arbitrary probe vector (query) through the persisted IVF index; " +
          "REFUSES a stale index (re-run build_vector_index after mutations). " +
          "Result is k driver-bounded rows") { in =>
        import org.apache.spark.sql.functions._
        val t = in.getUTF8String(0).toString
        val hasQid = !in.isNullAt(1)
        val attr = in.getUTF8String(2).toString
        val qjson = in.getUTF8String(5).toString.trim
        val spark = SparkSession.active
        require(hasQid ^ qjson.nonEmpty,
          "pass exactly one of query_id (probe an existing row) or " +
            "query (a JSON float-array literal)")
        val queries =
          if (qjson.nonEmpty) {
            // external-vector probe: one driver-built row, validated
            // HERE so a malformed literal errors instead of matching
            // nothing (from_json is null-on-malformed) or blowing up
            // mid-kernel (null elements, wrong dimension)
            val qdf = spark.range(1).select(lit(-1L).as("vec_id"),
              from_json(lit(qjson), org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.FloatType)).as("embedding"))
            val emb = qdf.head().getAs[scala.collection.Seq[Float]]("embedding")
            require(emb != null && emb.nonEmpty && !emb.contains(null),
              s"query is not a JSON float array (null or malformed element): $qjson")
            // dimension check is best-effort: when the index is absent
            // or unreadable, fall through so ivfTopKIndexed raises its
            // actionable "run build_vector_index" error instead of a
            // raw path-does-not-exist from the centroids read here
            val dimOpt = scala.util.Try {
              val (idxRoot, _, _) = graft.ops.Ivf.indexMeta(
                conf(), vecIndexPathFor(root, t, attr))
              spark.read.parquet(s"$idxRoot/centroids")
                .limit(1).select(size(col("centroid"))).head().getInt(0)
            }.toOption
            dimOpt.foreach(dim => require(emb.size == dim,
              s"query vector has ${emb.size} dims; the '$attr' index was built with $dim"))
            qdf
          } else embeddingOf(attr)(EsdbWriter.read(spark, path(t)))
            .where(col("vec_id") === in.getLong(1))
        val idxPath = vecIndexPathFor(root, t, attr)
        val probesArg = in.getInt(4)
        require(probesArg >= 0, s"probes must be >= 0, got $probesArg")
        // 0 = the index's recall-contract operating point; a blind
        // constant only when the index declares no contract
        val nProbe =
          if (probesArg > 0) probesArg
          else graft.ops.Ivf.defaultProbes(conf(), idxPath).getOrElse(4)
        val res = graft.ops.Ivf.ivfTopKIndexed(spark, idxPath, queries,
          k = in.getInt(3), nProbe = nProbe, corpusPath = Some(path(t)))
          .select("neighbor_id", "rank", "cos_x1e6")
          .collect() // k-bounded: the heap aggregate emits at most k rows
        if (res.isEmpty && hasQid && queries.isEmpty) throw new IllegalArgumentException(
          s"no row with event_id = ${in.getLong(1)} in $t (or its '$attr' attr is null)")
        res.toSeq.map(r => row(r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      case "clone_table" => proc("clone_table",
        Seq(p("table", StringType),
          p("target", StringType, comment = "new table name (same catalog; must not exist)"),
          p("version", LongType, Some("0"),
            comment = "pin the clone to this committed version (0 = current head)")),
        StructType(Seq(StructField("table", StringType),
          StructField("target", StringType), StructField("version", LongType))),
        "clone a store at a version into a new OPEN, UNMANAGED table — " +
          "dev/test sandboxes over real data") { in =>
        val t = in.getUTF8String(0).toString
        val tgt = in.getUTF8String(1).toString
        EsdbWriter.cloneStore(SparkSession.active, path(t), path(tgt),
          Some(in.getLong(2)).filter(_ > 0))
        Seq(row(UTF8String.fromString(t), UTF8String.fromString(tgt), version(tgt)))
      }
      case other => throw new UnsupportedOperationException(
        s"unknown procedure $other; available: ${names.mkString(", ")}")
    }
  }

  private def row(vals: Any*): InternalRow = new GenericInternalRow(vals.toArray)

  /** Where a table's vector index lives: an underscore-prefixed sibling
    * tree under the catalog root, invisible to table/namespace
    * discovery (childDirs filters `_` dirs) and keyed by (table, attr).
    */
  private def vecIndexPathFor(root: String, table: String, attr: String): String =
    (s"$root/_vecidx" +: table.split('.').toSeq :+ attr).mkString("/")

  /** vec_id = event_id; embedding = float-array payload attr. The
    * projection both the index build and the probe share.
    */
  private def embeddingOf(attr: String)(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.ops.Ivf.payloadEmbedding(attr)(df)

  private def proc(pname: String, params: Seq[ProcedureParameter], out: StructType,
                   describe: String)(run: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = describe
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = pname
        override def description(): String = describe
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val result = run(input).toArray
          java.util.Collections.singletonList[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = result
            override def readSchema(): StructType = out
          }).iterator()
        }
      }
    }
}
