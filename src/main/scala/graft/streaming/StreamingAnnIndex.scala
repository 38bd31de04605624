package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.sink.ParquetSink

/** Streaming maintenance of the sign-bucket ANN index (VERDICT r6 #5):
  * the LSH bucket table of [[graft.llm.Similarity.sAnnLsh]] kept as an
  * incrementally-absorbed streaming MV instead of a batch build — the
  * index a training-data pipeline needs when the corpus is a feed, not
  * a snapshot (new documents must become searchable without re-hashing
  * the world).
  *
  * Design, at the 100-TB lens:
  *  - the plane set is the index CONFIG — bounded (nPlanes·d doubles),
  *    fixed at index creation and shipped into each micro-batch as
  *    codegen'd literals ([[graft.llm.Similarity.signBucketCol]] — the
  *    SAME column expression as the batch build, so the two cannot
  *    drift); re-deriving planes from arriving data would silently
  *    re-bucket history;
  *  - each micro-batch is one NARROW map (norm + sign bits per vector,
  *    no join, no shuffle) appended through the ReplacingMergeTree-
  *    analog sink keyed on vec_id: an at-least-once redelivery of a
  *    chunk collapses by FINAL instead of duplicating index rows, and
  *    a mid-stream restart resumes from the checkpoint exactly as the
  *    dedup stream does ([[StreamingDedup.runStream]]);
  *  - search is [[graft.llm.Similarity.annLshSearch]] over the
  *    accumulated table — one shared search implementation over two
  *    index builds, so "the streamed index answers the probe set
  *    identically to the batch index" is pinned by construction plus
  *    the shared DuckDB oracle (the dataset-card twin pattern).
  *
  * Reference analog: the reference maintains its silver tables as
  * incrementally-absorbed MVs over the block stream
  * (clickhouse/init/02-silver-mvs.sql); this applies the same
  * build-as-you-ingest discipline to an ANN index.
  */
object StreamingAnnIndex {

  /** Feed schema: vec_id rides the chunk writer's `doc_id` rail (the
    * writer orders/names files by that column); embeddings are cast to
    * array<double> BEFORE the JSON feed — Java double round-trips
    * through JSON text exactly, so the streamed vectors are
    * bit-identical to the parquet originals. */
  private[streaming] val vecSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  /** Stream every unconsumed chunk into the index table, then stop
    * (Trigger.AvailableNow — the [[StreamingDedup.runStream]] resume
    * contract: call again after new chunks land and the same
    * checkpoint continues from the first unseen file). */
  def runStream(spark: SparkSession, feedDir: String, warehouse: String,
      planes: Array[Array[Double]]): Unit = {
    val path = s"$warehouse/ann_vectors"
    val query = StreamingDedup.readDocStream(spark, feedDir, vecSchema)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_ann_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.localCheckpoint()
        if (!batch.isEmpty) {
          val maxId = batch.agg(max(col("doc_id"))).collect()(0).getLong(0)
          val assigned = batch
            .select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
            .withColumn("nrm", sqrt(expr("dot_product(emb, emb)")))
            .withColumn("bucket",
              graft.llm.Similarity.signBucketCol(planes))
            .withColumn("block_height", col("vec_id"))
          ParquetSink.writeBatch(assigned, path, maxId, Seq("vec_id"))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** The accumulated index, FINAL-deduped — the search surface. */
  def indexTable(spark: SparkSession, warehouse: String): DataFrame =
    ParquetSink.readFinal(
      spark.read.parquet(s"$warehouse/ann_vectors"), Seq("vec_id"))
      .select("vec_id", "emb", "nrm", "bucket")

  /** Declared query (`s_stream_ann_lsh`): build the ANN index by
    * STREAMING the embeddings table — checkpointed file source, two
    * chunks, a stop, then the full feed against the same checkpoint
    * (the mid-stream restart, byte-identical early chunks skipped by
    * the source) — then answer the batch query's exact probe set over
    * the streamed index. Oracle: shared with `s_ann_lsh` (one search
    * over two index builds must be one result). Correctness-only:
    * its cost is micro-batch orchestration, the batch twin is the
    * benched operator. */
  /** Stream every unconsumed chunk into the IVF index table: per
    * micro-batch, one narrow map assigning each vector to its coarse
    * cell with the FIXED stored quantizer
    * ([[graft.llm.Similarity.assignCells]] — the same argmax
    * expression as the batch build), appended through the
    * ReplacingMergeTree-analog sink keyed on vec_id. */
  def runKmeansStream(spark: SparkSession, feedDir: String,
      warehouse: String, centroids: Array[Array[Double]]): Unit = {
    val path = s"$warehouse/ivf_vectors"
    val query = StreamingDedup.readDocStream(spark, feedDir, vecSchema)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_ivf_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.localCheckpoint()
        if (!batch.isEmpty) {
          val maxId = batch.agg(max(col("doc_id"))).collect()(0).getLong(0)
          val assigned = graft.llm.Similarity.assignCells(
            batch.select(col("doc_id").as("vec_id"),
                col("embedding").as("emb"))
              .withColumn("nrm", sqrt(expr("dot_product(emb, emb)"))),
            centroids)
            .withColumn("block_height", col("vec_id"))
          ParquetSink.writeBatch(assigned, path, maxId, Seq("vec_id"))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Declared query (`s_stream_ann_kmeans`): the FULL production ANN
    * topology in one scenario — the trained coarse quantizer persists
    * through the versioned model store (the rare producer pass,
    * VERDICT r12 #1), the corpus STREAMS through the fixed stored
    * model into an incrementally-absorbed index MV (checkpointed, two
    * chunks, a mid-stream restart), and the search runs the SAME
    * multi-probe implementation as the batch query over the
    * accumulated index. Equals batch `s_ann_kmeans` and shares its
    * oracle: the model is bit-identical (trained on the full corpus,
    * stored, loaded), assignment is the same expression, search is
    * the same body. Correctness-only. */
  def sStreamAnnKmeans(spark: SparkSession, dir: String, k: Int = 3,
      nQueries: Int = 20, nCells: Int = 8, iters: Int = 2,
      nprobe: Int = 2, nChunks: Int = 5): DataFrame = {
    graft.Tables.tune(spark)
    val feed = StreamingDedup.freshDir("ivf_feed")
    val warehouse = StreamingDedup.freshDir("ivf_wh")
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("embedding"))
    // PRODUCER: train on the full corpus, persist versioned, load back
    val eTrain = vecs
      .select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", sqrt(expr("dot_product(emb, emb)")))
      .localCheckpoint()
    val modelRoot = StreamingDedup.freshDir("ivf_model_store")
    graft.sink.ModelStore.saveKmeans(spark, modelRoot, "ivf_stream", 1L,
      graft.llm.Similarity.kmeansCentroids(eTrain, nCells, iters))
    val centroids =
      graft.sink.ModelStore.loadKmeans(spark, modelRoot, "ivf_stream")
    ParquetSink.delete(new java.io.File(modelRoot))
    // CONSUMER: stream the corpus through the fixed stored model
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      takeChunks = 2, schema = vecSchema)
    runKmeansStream(spark, feed, warehouse, centroids)
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      schema = vecSchema)
    runKmeansStream(spark, feed, warehouse, centroids)
    val index = ParquetSink.readFinal(
      spark.read.parquet(s"$warehouse/ivf_vectors"), Seq("vec_id"))
      .select("vec_id", "emb", "nrm", "cell")
    graft.llm.Similarity.kmeansSearchIndexed(index, centroids, k,
      nQueries, nprobe)
  }

  /** Stream every unconsumed chunk into a PLAIN normalized vector
    * table (vec_id, emb, nrm) — the minimal embedding index the
    * decontamination census reads: one narrow map per micro-batch
    * (norm only, no bucket/cell config), appended through the
    * ReplacingMergeTree-analog sink keyed on vec_id. */
  def runVectorStream(spark: SparkSession, feedDir: String,
      warehouse: String): Unit = {
    val path = s"$warehouse/vec_index"
    val query = StreamingDedup.readDocStream(spark, feedDir, vecSchema)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_vec_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.localCheckpoint()
        if (!batch.isEmpty) {
          val maxId = batch.agg(max(col("doc_id"))).collect()(0).getLong(0)
          val normed = batch
            .select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
            .withColumn("nrm", sqrt(expr("dot_product(emb, emb)")))
            .withColumn("block_height", col("vec_id"))
          ParquetSink.writeBatch(normed, path, maxId, Seq("vec_id"))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Declared query (`s_stream_decontaminate`, VERDICT r13 #5):
    * CONTINUOUS semantic decontamination — the training corpus streams
    * into an incrementally-accumulated PK-FINAL embedding index
    * (checkpointed, two chunks, a mid-stream restart over the full
    * feed), and the SAME bounded-probe leak census as the batch query
    * ([[graft.llm.Similarity.decontaminateRel]]) runs over the
    * accumulated index — how a feed-shaped training pipeline actually
    * consumes the leakage report: re-run the census as the corpus
    * grows, not re-scan a frozen snapshot. The probe set (the bounded
    * eval benchmark, vec_id < 32) reads from the same index once fully
    * absorbed. Equals batch `s_decontaminate` and shares its oracle.
    * Correctness-only: micro-batch orchestration dominates, the batch
    * twin is the benched operator. */
  def sStreamDecontaminate(spark: SparkSession, dir: String,
      nProbes: Int = 32, threshold: Double = 0.4,
      nChunks: Int = 5): DataFrame = {
    graft.Tables.tune(spark)
    val feed = StreamingDedup.freshDir("decon_feed")
    val warehouse = StreamingDedup.freshDir("decon_wh")
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("embedding"))
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      takeChunks = 2, schema = vecSchema)
    runVectorStream(spark, feed, warehouse)
    // mid-stream restart over the full feed, same checkpoint
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      schema = vecSchema)
    runVectorStream(spark, feed, warehouse)
    val index = ParquetSink.readFinal(
      spark.read.parquet(s"$warehouse/vec_index"), Seq("vec_id"))
      .select("vec_id", "emb", "nrm")
    graft.llm.Similarity.decontaminateRel(index, nProbes, threshold)
  }

  /** Stream every unconsumed chunk into the prototypicality FACT table
    * — per micro-batch, one narrow map computing each vector's argmax
    * cell and cosine-to-own-centroid with the FIXED stored quantizer
    * ([[graft.llm.Similarity.assignWithProto]], the same expression as
    * the batch build), appended through the ReplacingMergeTree-analog
    * sink keyed on vec_id. */
  def runPruneStream(spark: SparkSession, feedDir: String,
      warehouse: String, centroids: Array[Array[Double]]): Unit = {
    val path = s"$warehouse/proto_facts"
    val query = StreamingDedup.readDocStream(spark, feedDir, vecSchema)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_proto_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.localCheckpoint()
        if (!batch.isEmpty) {
          val maxId = batch.agg(max(col("doc_id"))).collect()(0).getLong(0)
          val facts = graft.llm.Similarity.assignWithProto(
            batch.select(col("doc_id").as("vec_id"),
                col("embedding").as("emb"))
              .withColumn("nrm", sqrt(expr("dot_product(emb, emb)"))),
            centroids)
            .withColumn("block_height", col("vec_id"))
          ParquetSink.writeBatch(facts, path, maxId, Seq("vec_id"))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Declared query (`s_stream_prune`): CONTINUOUS prototype pruning —
    * the quantizer trains once and persists through the versioned
    * model store (the rare producer pass), the corpus STREAMS through
    * the fixed stored model into a PK-FINAL prototypicality fact table
    * (checkpointed, two chunks, a mid-stream restart), and the
    * rank-and-cut read ([[graft.llm.Similarity.pruneRankFromFacts]] —
    * the SAME body as batch, ranks being non-additive derive at read)
    * re-evaluates as the corpus grows. Equals batch
    * `s_prune_prototypes` and shares its oracle. Correctness-only:
    * micro-batch orchestration dominates, the batch twin is benched. */
  def sStreamPrune(spark: SparkSession, dir: String, nCells: Int = 8,
      iters: Int = 2, prunePct: Int = 25, nChunks: Int = 5): DataFrame = {
    graft.Tables.tune(spark)
    val feed = StreamingDedup.freshDir("proto_feed")
    val warehouse = StreamingDedup.freshDir("proto_wh")
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("embedding"))
    // PRODUCER: train on the full corpus, persist versioned, load back
    val eTrain = vecs
      .select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", sqrt(expr("dot_product(emb, emb)")))
      .localCheckpoint()
    val modelRoot = StreamingDedup.freshDir("proto_model_store")
    graft.sink.ModelStore.saveKmeans(spark, modelRoot, "proto_stream", 1L,
      graft.llm.Similarity.kmeansCentroids(eTrain, nCells, iters))
    val centroids =
      graft.sink.ModelStore.loadKmeans(spark, modelRoot, "proto_stream")
    ParquetSink.delete(new java.io.File(modelRoot))
    // CONSUMER: stream the corpus through the fixed stored model
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      takeChunks = 2, schema = vecSchema)
    runPruneStream(spark, feed, warehouse, centroids)
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      schema = vecSchema)
    runPruneStream(spark, feed, warehouse, centroids)
    graft.llm.Similarity.pruneRankFromFacts(
      ParquetSink.readFinal(
        spark.read.parquet(s"$warehouse/proto_facts"), Seq("vec_id"))
        .select("vec_id", "cell", "proto"),
      prunePct)
  }

  def sStreamAnnLsh(spark: SparkSession, dir: String, k: Int = 3,
      nQueries: Int = 20, nPlanes: Int = 4, nChunks: Int = 5): DataFrame = {
    graft.Tables.tune(spark)
    val feed = StreamingDedup.freshDir("ann_feed")
    val warehouse = StreamingDedup.freshDir("ann_wh")
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("embedding"))
    // index config: same plane derivation as the batch build
    val planes = graft.llm.Similarity.annPlanes(
      vecs.select(col("doc_id").as("vec_id"),
        col("embedding").as("emb")), nPlanes)
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      takeChunks = 2, schema = vecSchema)
    runStream(spark, feed, warehouse, planes)
    // mid-stream restart over the full feed, same checkpoint
    StreamingDedup.writeDocChunks(spark, vecs, feed, nChunks,
      schema = vecSchema)
    runStream(spark, feed, warehouse, planes)
    graft.llm.Similarity.annLshSearch(
      indexTable(spark, warehouse), k, nQueries, nPlanes)
  }
}
