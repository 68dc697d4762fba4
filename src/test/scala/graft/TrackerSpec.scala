package graft

import graft.model.FilterConfig

class TrackerSpec extends SparkSpec {
  import spark.implicits._

  test("facade: sync, query, checkpoint, reconcile") {
    val chain = MockChain.linear(40, n => if (n % 2 == 0) 2 else 5)
    val provider = new MockProvider(spark, chain)
    val root = tmpDir("trk")
    val t = Tracker(spark, provider, root)
    val r = t.sync()
    assert(r.headNumber == 39)
    assert(t.logs.count() == (0L until 40L)
      .map(n => if (n % 2 == 0) 2L else 5L).sum)
    assert(t.lastBlock.map(_.number).contains(39L))
    // relational surface over the tracked log
    val byAddr = t.logs.groupBy("address").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAddr.keySet == Set("a0", "a1", "a2"))
    // CDC preview of a fork without mutating the store: a tracker bound to
    // the forked provider over the same store root
    val forked = MockChain.fork(chain, depth = 2, extend = 1)
    val t2 = Tracker(spark, new MockProvider(spark, forked), root)
    val delta = t2.reconcile(forked.takeRight(10).map(_.header))
    val actions = delta.select("action").as[String].collect()
    assert(actions.count(_ == "del") == 7)  // blocks 38,39 = 2+5 logs
    assert(actions.count(_ == "add") == 3)  // 3 forked blocks × 1 log
    assert(t.logs.count() == 140)           // store untouched
  }
}
