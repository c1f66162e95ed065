package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset split assignment — ONE definition of the split
  * arithmetic, shared by the oracle-checked q84 query and the CorpusBuild
  * pipeline so the two can never drift apart. A doc's split depends only
  * on its own id (md5 → first 8 hex chars → bucket 0-99), so it is
  * partition-invariant, engine-portable, and stable as the corpus grows.
  */
object Splits {

  /** Hash bucket 0-99 of an id column (q52's arithmetic). */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Canonical 90/5/5 train/val/test label for a bucket column. */
  def splitOfBucket(b: Column): Column =
    when(b < 90, "train").when(b < 95, "val").otherwise("test")

  /** 90/5/5 label straight from the id. */
  def split(id: Column): Column = splitOfBucket(bucket(id))
}
