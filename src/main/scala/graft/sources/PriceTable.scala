package graft.sources

import org.apache.spark.sql.SparkSession

/** The symbol-partitioned prices table-of-record — [[AtomicTable]]
  * specialized to the reference's quote store (symbol partitions,
  * [[Warehouse.PriceKeys]] identity): atomic fully-old-or-fully-new
  * mutations via staged immutable dirs + manifest commit, time travel,
  * optimistic concurrency, compaction, and vacuum. See [[AtomicTable]]
  * for the protocol; [[graft.WarehouseSpec]] failpoint-tests it
  * through this constructor.
  */
object PriceTable {
  def apply(spark: SparkSession, root: String,
            failpoint: String => Unit = _ => ()): AtomicTable =
    AtomicTable(spark, root, partCol = "symbol",
      defaultKeys = Warehouse.PriceKeys, failpoint = failpoint)
}
