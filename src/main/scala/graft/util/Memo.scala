package graft.util

/** Concurrent once-only memo for session-scoped staged artifacts.
  *
  * `TrieMap.getOrElseUpdate` may evaluate its by-name default twice
  * under a concurrent first access — for the values cached here
  * (localCheckpoint RDDs, temp staging dirs) that leaks a duplicate
  * checkpoint or directory. Wrapping the builder in a lazy holder
  * makes the VALUE single-evaluation: the map race only ever
  * constructs an extra unevaluated thunk, and every caller forces
  * the one holder that won `putIfAbsent` (lazy val is thread-safe).
  */
final class Memo[K, V] {
  private val map = scala.collection.concurrent.TrieMap.empty[K, Memo.Holder[V]]
  def getOrElseUpdate(key: K, build: => V): V =
    map.getOrElseUpdate(key, new Memo.Holder(() => build)).value
}

object Memo {
  final class Holder[V](thunk: () => V) {
    lazy val value: V = thunk()
  }
}
