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
    val salt = "__graft_salt"
    require(!big.columns.contains(salt) && !small.columns.contains(salt),
      s"inputs must not carry a $salt column")
    // salt from the row's physical position, not its payload: a hot key
    // whose rows carry identical values still fans out over all n buckets
    // (monotonically_increasing_id = partitionId<<33 | row index, so
    // pmod round-robins within every partition). Any assignment is
    // correct — the small side is replicated across all n salts.
    val salted = big.withColumn(salt,
      pmod(monotonically_increasing_id(), lit(n.toLong)).cast("int"))
    val replicated = small.withColumn(salt,
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, salt)).drop(salt)
  }

  /** Convenience: top-k heaviest keys of a column (to decide what to salt). */
  def heavyHitters(df: DataFrame, key: Column, k: Int = 10): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc).limit(k)
}
