package graft

import scala.util.Random

/** Named source registry — the port of dungbeetle's DB pool
  * (`internal/dbpool/dbpool.go:14-130`) and result-backend map
  * (`internal/core/results.go:12-63`).
  *
  * A "source" here is a directory of parquet tables (one scale-factor dir of
  * the fixtures, or any layout with `<table>.parquet` children); a "result
  * backend" is a directory results are materialized into. `get`/`getRandom`/
  * `filterByTags` mirror the reference's selection semantics (`dbpool.go:62-89,
  * 116-130`): named lookup, random spread across the pool, and tag filtering
  * at task-load time.
  */
final case class SourcePool(sources: Map[String, String]) {
  def names: Seq[String] = sources.keys.toSeq.sorted

  /** dbpool.Get (`dbpool.go:62-69`). */
  def get(name: String): String =
    sources.getOrElse(name, throw new NoSuchElementException(s"unknown source: $name"))

  /** dbpool.GetRandom (`dbpool.go:72-89`) — random load spreading. */
  def getRandom(rnd: Random = Random): (String, String) = {
    require(sources.nonEmpty, "empty source pool")
    val ks = names
    val k = ks(rnd.nextInt(ks.size))
    (k, sources(k))
  }

  /** dbpool.FilterByTags (`dbpool.go:116-130`): every tag must resolve. */
  def filterByTags(tags: Seq[String]): SourcePool = {
    val trimmed = tags.map(_.trim).filter(_.nonEmpty)
    val missing = trimmed.filterNot(sources.contains)
    if (missing.nonEmpty)
      throw new NoSuchElementException(s"unknown source(s): ${missing.mkString(",")}")
    SourcePool(sources.view.filterKeys(trimmed.contains).toMap)
  }

  def isEmpty: Boolean = sources.isEmpty
}

object SourcePool {
  def single(name: String, dir: String): SourcePool = SourcePool(Map(name -> dir))
}
