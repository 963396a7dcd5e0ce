package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (parity with the reference's only skew control — the
  * chief-worker-minimum-data guard, `AM/ApplicationMaster.java:987-1008` —
  * generalized to keyed skew).
  *
  * First line of defense is AQE's skew-join splitting (on in GraftSession).
  * `saltedJoin` is the explicit fallback for pathological keys AQE can't
  * split (e.g. one key = 30% of a 100 TB fact table): the big side gets a
  * deterministic salt in [0, n), the small side is replicated n ways, and
  * the join key becomes (key, salt) — fanning one hot partition out to n. */
object SkewOps {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `n` ways.
    * Produces exactly the rows of the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0)
    // deterministic salt spreads each hot key over n reducers; any
    // per-row-stable value works since the small side carries all salts
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(n)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Convenience: top-k heaviest keys of a column (to decide what to salt). */
  def heavyHitters(df: DataFrame, key: Column, k: Int = 10): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc).limit(k)
}
