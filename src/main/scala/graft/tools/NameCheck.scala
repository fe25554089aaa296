package graft.tools
object NameCheck {
  def main(args: Array[String]): Unit = {
    val names = graft.SparkEntry.allSpecs.map(_.name)
    println(s"[namecheck] total=${names.size} distinct=${names.distinct.size}")
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    if (dups.nonEmpty) println(s"[namecheck] DUPES: ${dups.mkString(",")}")
    val noOracle = graft.SparkEntry.allSpecs.filter(_.oracle.isEmpty).map(_.name)
    println(s"[namecheck] no-oracle: ${noOracle.sorted.mkString(",")}")
  }
}
