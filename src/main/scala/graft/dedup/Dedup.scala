package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for LLM-data pipelines (BASELINE.json scale
  * extensions): exact, MinHash+LSH, SimHash, blocked n-gram Jaccard.
  *
  * 100 TB design: every variant avoids the quadratic all-pairs join —
  *  - exact: one hash-groupBy (single shuffle on a 128-bit key);
  *  - MinHash+LSH: per-doc signatures (linear), candidates only from
  *    band-bucket collisions (shuffle on band keys, bucket sizes bounded
  *    by real near-dup density), Jaccard verification only on candidates;
  *  - SimHash: per-doc 32-bit signature (linear); near-dup = signature
  *    bucket join;
  *  - n-gram Jaccard: blocked on low-cardinality keys so each block's
  *    pair count is bounded.
  */
object Dedup {

  /** Exact dedup groups: content hash → group size + canonical (min) id.
    * (DataFrame in: `idCol`, `textCol`.) */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** Per-doc MinHash signature rows: (id, seed, minhash) for seeds
    * 0..numPerm-1 over word-`n`-gram shingles. Linear in total shingles. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerm: Int, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), shingleN)).as("sh"))
    val seeds = (0 until numPerm).map(i => lit(i))
    sh.select(col("id"), explode(array(seeds: _*)).as("seed"), col("sh"))
      .select(col("id"), col("seed"),
        TextOps.hash60(concat(col("seed").cast("string"), lit("|"), col("sh"))).as("h"))
      .groupBy(col("id"), col("seed")).agg(min(col("h")).as("minhash"))
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numPerm), bucket-join on (band, band-signature), keep each pair
    * once. Only colliding buckets generate pairs. */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(md5(concat_ws(",", sort_array(collect_list(
        concat(col("seed").cast("string"), lit(":"), col("minhash").cast("string")))))
      ).as("band_key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
  }

  /** Exact Jaccard verification of candidate pairs over distinct shingle
    * sets — joins only the candidate docs' shingles, not all pairs. */
  def verifyJaccard(candidates: DataFrame, df: DataFrame, idCol: String,
                    textCol: String, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(TextOps.shingles(TextOps.tokens(col(textCol)), shingleN)).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = candidates
      .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    candidates
      .join(inter, Seq("id_a", "id_b"), "left").na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /** 32-bit SimHash per doc over token frequencies: bit b is set when the
    * count-weighted sum of (2·bit_b(hash(token)) − 1) is positive. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", pmod(TextOps.hash60(col("tok")), lit(4294967296L)))
    // shiftright/shiftleft by a COLUMN amount only exist in SQL form.
    val bits = tok.select(col("id"), col("w"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("contrib",
        col("w") * (expr("shiftright(h, b)").bitwiseAND(lit(1L)) * 2 - 1))
      .groupBy(col("id"), col("b"))
      .agg(sum(col("contrib")).as("s"))
    bits.withColumn("bitval",
        when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(lit(0L)))
      .groupBy(col("id")).agg(sum(col("bitval")).as("simhash"))
  }
}
