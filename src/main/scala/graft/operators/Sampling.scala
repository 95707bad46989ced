package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, xxhash64}

/** Bounded deterministic sampling — the idiom behind every "fit/tune on
  * a sample" scale path in the engine. */
object Sampling {

  /** Order by a seeded hash of `idCol`, take the first `n`. Catalyst
    * plans Sort+Limit as TakeOrderedAndProject — each input partition
    * keeps an n-bounded heap and the driver merges heaps — so the
    * sample is bounded at any input size (never a full sort or
    * single-partition materialization), unbiased w.r.t. storage order,
    * and reproducible under `seed`. When the input has ≤ n rows the
    * sample IS the full set. Callers: the IVF quantizer fit
    * ([[graft.sim.IvfAnn]]) and the DBSCAN ε-tuner
    * (`Clustering.sampledKneeEps`); IvfQuantizerSpec pins the plan
    * shape, bound, and seed-determinism. */
  def hashOrderedLimit(df: DataFrame, idCol: Column, n: Int,
                       seed: Long): DataFrame =
    df.orderBy(xxhash64(idCol, lit(seed)), idCol).limit(n)
}
