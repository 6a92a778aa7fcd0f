package graft

/** Semantics of the shared session-cache helper (the single spelling
  * behind every operator serving index since r12): build-once reuse,
  * lost-value release on invalidate, key-scoped invalidation, and the
  * null-session wildcard. The dead-session sweep branch is exercised
  * structurally (a stopped session cannot be created next to the
  * shared spec context in one JVM): every access path calls sweep(),
  * so the live-session assertions here run through it.
  */
class SessionCacheSpec extends SparkSpecBase {

  test("builds once per key, releases the loser, invalidates by key") {
    var builds = 0
    var released = List.empty[String]
    val c = new SessionCache[String, String](v => released ::= v)
    def get(k: String): String =
      c.getOrBuild(spark, k) { builds += 1; s"v-$k-$builds" }
    assert(get("a") == "v-a-1" && get("a") == "v-a-1" && builds == 1)
    assert(get("b") == "v-b-2" && builds == 2)
    assert(c.size == 2)
    // key-scoped invalidation releases exactly the dropped value
    c.invalidate(spark, _ == "a")
    assert(released == List("v-a-1"))
    assert(c.size == 1)
    assert(get("a") == "v-a-3" && builds == 3) // rebuilt after the drop
    // null session = every session; true predicate = every key
    c.invalidate(null, _ => true)
    assert(c.size == 0)
    assert(released.toSet == Set("v-a-1", "v-a-3", "v-b-2"))
  }

  test("a lost build race releases exactly the loser, winner serves both") {
    // the documented get+putIfAbsent contract under REAL concurrency:
    // both threads are held at a barrier until both have passed the
    // get-miss, so both build deterministically; exactly one value
    // wins the putIfAbsent, the other is released, and both callers
    // observe the SAME winning value
    val entered = new java.util.concurrent.CyclicBarrier(2)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val released =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val c = new SessionCache[String, String](v => { released.add(v): Unit })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fs = (1 to 2).map(_ => pool.submit(
        new java.util.concurrent.Callable[String] {
          def call(): String = c.getOrBuild(spark, "race") {
            entered.await(10, java.util.concurrent.TimeUnit.SECONDS)
            s"v-${builds.incrementAndGet()}-${Thread.currentThread().getId}"
          }
        }))
      val got = fs.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(builds.get() == 2, "the barrier should force both builds")
      assert(got(0) == got(1), "racers observed different cached values")
      assert(c.size == 1)
      assert(released.size() == 1 && !released.contains(got(0)),
        s"released=$released winner=${got(0)}")
    } finally pool.shutdownNow()
  }

  test("a foreign session's entries survive another session's invalidate") {
    // newSession shares the context but is a distinct key dimension —
    // the boundary-hook contract is per-session
    val other = spark.newSession()
    val c = new SessionCache[String, Int](_ => ())
    c.getOrBuild(spark, "k")(1)
    c.getOrBuild(other, "k")(2)
    assert(c.size == 2)
    c.invalidate(other, _ => true)
    assert(c.size == 1)
    assert(c.getOrBuild(spark, "k")(99) == 1, "wrong entry dropped")
  }
}
