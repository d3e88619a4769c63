package graft

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import graft.sink.{ConnectionFactory, SinkConnection}

/** In-memory transactional fake for sink tests (SURVEY.md §7.5 risk 2: no
  * live Postgres in the harness). Rows failing `failOn` raise, emulating a
  * constraint violation; savepoint/rollback semantics are modeled so the
  * binary-split isolation path is genuinely exercised.
  *
  * The factory is serialized into the executor closure (even in local mode
  * each task gets a deserialized copy), so observable state lives in the
  * JVM-global [[FakeSinkState]], keyed per test.
  */
object FakeSinkState {
  private val state = mutable.Map.empty[String, (mutable.ArrayBuffer[Seq[Any]], AtomicInteger)]

  def init(id: String): Unit = synchronized { state(id) = (mutable.ArrayBuffer.empty, new AtomicInteger) }
  def committed(id: String): Seq[Seq[Any]] = synchronized { state(id)._1.toIndexedSeq }
  def connectionCount(id: String): Int = synchronized { state(id)._2.get }

  private[graft] def record(id: String, rows: Seq[Seq[Any]]): Unit =
    synchronized { state(id)._1 ++= rows }
  private[graft] def countConnection(id: String): Unit = synchronized { state(id)._2.incrementAndGet() }
}

class FakeSinkConnection(id: String, failOn: Seq[Any] => Boolean) extends SinkConnection {
  private var pending = Vector.empty[Seq[Any]] // current transaction
  private var marks = Map.empty[String, Int]   // savepoint name → pending size
  var batchCalls = 0
  val committed = mutable.ArrayBuffer.empty[Seq[Any]] // for direct (driver-side) use

  def executeBatch(sql: String, batch: Seq[Seq[Any]]): Unit = {
    batchCalls += 1
    // Harsh mode: rows before the failing one DO land in the transaction,
    // like a real driver mid-batch failure — only rollback-to-savepoint can
    // undo them. Catches implementations that skip the rollback.
    batch.foreach { row =>
      if (failOn(row)) throw new RuntimeException(s"constraint violation on $row")
      pending :+= row
    }
  }
  def savepoint(name: String): Unit = marks += name -> pending.size
  def rollbackTo(name: String): Unit = marks.get(name).foreach(n => pending = pending.take(n))
  def release(name: String): Unit = marks -= name
  def commit(): Unit = {
    committed ++= pending
    if (id.nonEmpty) FakeSinkState.record(id, pending)
    pending = Vector.empty
  }
  def close(): Unit = ()
}

/** `failOnKeys` marks bad rows by their first column value (must be
  * serializable data, not a closure over driver state).
  */
class FakeConnectionFactory(id: String, failOnKeys: Set[Long]) extends ConnectionFactory {
  FakeSinkState.init(id)
  def connect(): SinkConnection = {
    FakeSinkState.countConnection(id)
    new FakeSinkConnection(id, r => failOnKeys(r.head.asInstanceOf[Long]))
  }
}
