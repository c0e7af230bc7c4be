package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Primitive.node
import graft.plan.ReadPlanner
import graft.store.GraphStore
import graft.write.Writer

/** Persisted-store behavior: save/load round trip, id-range partition
  * layout, and partition pruning under asof horizons — the scale
  * mechanics behind time travel (istore partitions,
  * libaddb/addb-istore.h:22-24).
  */
class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("save/load round-trips and asof prunes partition directories") {
    // ids straddling two storage partitions (PartShift=20 → 1M each)
    val prims = Seq(
      node(1, value = Some("old-a")), node(2, value = Some("old-b")),
      node((1L << 20) + 5, value = Some("new-a")),
      node((1L << 20) + 6, value = Some("new-b")))
    val st = GraphStore.fromSeq(spark, prims)
    val dir = Files.createTempDirectory("graft_store").toString + "/prims"
    st.save(dir)

    // two partition directories on disk
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("id_part=")).map(_.getName).sorted
    assert(parts.toSeq == Seq("id_part=0", "id_part=1"))

    val loaded = GraphStore.load(spark, dir)
    assert(loaded.current.count() == 4)

    // asof below the partition boundary: only partition 0 survives
    val asof = loaded.asOf(100)
    assert(asof.current.collect().map(_.getAs[String]("value")).toSet ==
      Set("old-a", "old-b"))
    val physical = asof.primitives.queryExecution.executedPlan.toString
    assert(physical.contains("id_part") || physical.contains("PartitionFilters"),
      s"expected partition pruning in plan:\n$physical")

    // engine reads work against the loaded store
    val n = ReadPlanner.plan(loaded, "read (node result=count)").head.getLong(0)
    assert(n == 4L)

    // appends on a loaded store work despite the extra partition column
    val (st2, ids) = Writer.append(loaded, Seq(Writer.Spec(value = Some("x"))))
    assert(ids.head == (1L << 20) + 7)
    assert(st2.current.count() == 5)
  }
}
