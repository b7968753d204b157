package graft.state

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: arbitrary put/remove/commit/abort sequences applied to
  * both providers match a trivial in-JVM model map at every commit point
  * (SURVEY.md §5's upgrade over the reference's example-based coverage).
  * Generators are sampled with fixed seeds (scalatestplus bridge is not in
  * the offline cache) so failures are reproducible.
  */
class StatePropertySuite extends AnyFunSuite {
  import StateTestHelper._

  sealed trait Op
  case class PutOp(key: String, value: Int) extends Op
  case class RemoveOp(key: String) extends Op
  case object CommitOp extends Op
  case object AbortOp extends Op

  private val keys = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for { k <- keys; v <- Gen.choose(0, 1000) } yield PutOp(k, v)),
    2 -> keys.map(RemoveOp),
    2 -> Gen.const(CommitOp),
    1 -> Gen.const(AbortOp))

  private def run(provider: GraftStateStoreProviderBase, ops: List[Op]): Unit = {
    var committed = Map.empty[String, Int] // model of last committed version
    var model = committed                  // model of the open store
    var version = 0L
    var store = provider.getStore(version, None)

    ops.foreach {
      case PutOp(k, v) =>
        put(store, k, v); model += (k -> v)
        assert(get(store, k).contains(v))
      case RemoveOp(k) =>
        remove(store, k); model -= k
        assert(get(store, k).isEmpty)
      case CommitOp =>
        version = store.commit()
        committed = model
        store = provider.getStore(version, None)
        assert(contents(store) === committed)
      case AbortOp =>
        store.abort()
        model = committed
        store = provider.getStore(version, None)
        assert(contents(store) === committed)
    }
    store.abort()
  }

  private def sample(n: Int, seed: Long): List[Op] =
    Gen.listOfN(n, genOp)(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("inmemory provider matches model under random op sequences") {
    (1 to 20).foreach { seed =>
      val dir = Files.createTempDirectory("graft-prop-mem").toString
      val p = initProvider(new InMemoryStateStoreProvider, dir)
      withClue(s"seed=$seed") { run(p, sample(60, seed)) }
      p.close()
    }
  }

  test("rocksdb provider matches model under random op sequences") {
    (1 to 8).foreach { seed =>
      val dir = Files.createTempDirectory("graft-prop-rdb").toString
      val p = initProvider(new RocksDbStateStoreProvider, dir)
      withClue(s"seed=$seed") { run(p, sample(40, seed)) }
      p.close()
    }
  }
}
