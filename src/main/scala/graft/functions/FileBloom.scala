package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom sidecar index — the data-skipping shape min/max file
  * statistics cannot provide. Parquet footers prune RANGE predicates on
  * clustered columns (s19 measures exactly that), but a point lookup on
  * a column SCATTERED across files (user_id in a time-partitioned fact
  * table — the "fetch this user's events" serving query) finds every
  * file's [min,max] straddling the key: zero files pruned, full-table
  * scan for a handful of rows. The fix every modern table format ships
  * (Delta/Iceberg bloom filter indexes, ClickHouse bloom_filter skip
  * indexes) is a per-file Bloom filter on the lookup column: ~10 bits
  * per distinct key at 1% fpp, consulted at PLANNING time; a false
  * positive costs one wasted file scan, never a wrong row.
  *
  * Scale shape: the build is one pass over the table grouped by
  * `input_file_name()` — each file's keys fold into a fixed-size
  * mergeable [[BloomFilter]] buffer through a typed [[Aggregator]]
  * (partial aggregation applies: Spark merges per-partition filters
  * map-side, so only file-count × filter-size bytes shuffle, nothing
  * row-sized). The sidecar is file-count-sized and lives WITH the
  * table (here: returned; in a real lakehouse: written next to the
  * manifest). The probe is driver arithmetic over the sidecar — the
  * same place Iceberg evaluates its metadata trees — and emits a
  * pruned file list for `spark.read.parquet(files: _*)`.
  *
  * Keying matches [[BloomProbe]]: filters hold `xxhash64(key)` longs,
  * probes hash the same way, so this sidecar could also feed the
  * codegen `might_contain` path for row-level (not file-level) probes.
  */
object FileBloom {

  /** Mergeable per-group Bloom aggregator over pre-hashed longs. The
    * buffer serializes via Kryo (BloomFilterImpl is Serializable);
    * `expectedItems`/`fpp` size the per-FILE filter — at 1% fpp that
    * is ~1.2 KB per 1000 distinct keys per file. */
  class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, h: Long): BloomFilter = { b.putLong(h); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    def finish(b: BloomFilter): Array[Byte] = BloomProbe.serialize(b)
    def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the sidecar for a parquet layout: (file, serialized filter)
    * per data file, distributed build, file-count-sized result. */
  def buildIndex(spark: SparkSession, path: String, keyCol: String,
                 expectedPerFile: Long = 10000L, fpp: Double = 0.01)
      : Seq[(String, Array[Byte])] = {
    import spark.implicits._
    val agg = new BloomAgg(math.max(1L, expectedPerFile), fpp)
    spark.read.parquet(path)
      .filter(col(keyCol).isNotNull)
      .select(input_file_name().as("f"), xxhash64(col(keyCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("bloom"))
      .collect().toSeq
  }

  /** Planning-time pruning: the files that might contain ANY probe key
    * (a file is skipped only when the filter rules out EVERY key —
    * Bloom "no" is definitive, "yes" may waste one file scan). */
  def candidateFiles(index: Seq[(String, Array[Byte])],
                     keys: Seq[Long]): Seq[String] = {
    val hashes = keys.map(k =>
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        k, org.apache.spark.sql.types.LongType, 42L))
    index.collect {
      case (file, bytes)
          if {
            val bf = BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(bytes))
            hashes.exists(bf.mightContainLong)
          } => file
    }
  }

  /** The composed lookup: prune via the sidecar, scan only candidate
    * files, then apply the EXACT predicate (Bloom false positives die
    * here — the result is identical to a full-table scan by
    * construction, which is what the DuckDB oracle checks). Returns
    * the scanned frame; callers project/order. An empty candidate list
    * short-circuits to an empty frame of the layout's schema. */
  def lookup(spark: SparkSession, path: String,
             index: Seq[(String, Array[Byte])], keyCol: String,
             keys: Seq[Long]): DataFrame = {
    val files = candidateFiles(index, keys)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol).isin(keys: _*))
  }
}
