package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

/** Registry-backed endpoint factory for specs: the partition-parallel
  * publishers open endpoints ON executor threads, so a collector can't
  * ride the closure (Spark serializes foreachPartition closures even in
  * local mode — the executor would fill a deserialized copy). The
  * factory ships only a string key; local-mode executor threads share
  * this JVM, so `open()` resolves the same buffer the assertion reads. */
object TestEndpoints {
  private val registry = new ConcurrentHashMap[String, ArrayBuffer[String]]()

  def clear(key: String): Unit = registry.remove(key)

  /** Lines emitted under `key`, in emit order (per-partition blocks). */
  def lines(key: String): Seq[String] =
    Option(registry.get(key)).map(b => b.synchronized(b.toSeq))
      .getOrElse(Seq.empty)

  final case class Factory(key: String) extends CloudWatchSink.EndpointFactory {
    override def open(): CloudWatchSink.Endpoint =
      new CloudWatchSink.Endpoint {
        override def emit(ls: Seq[String]): Unit = {
          val buf = registry.computeIfAbsent(key, _ => ArrayBuffer.empty)
          buf.synchronized { buf ++= ls }
        }
      }
  }
}
