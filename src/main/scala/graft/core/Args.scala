package graft.core

/** `ParameterTool.fromArgs` analogue (`WordCount.java:58`): parses
  * `--key value` pairs; bare `--flag` (followed by another `--` or end)
  * becomes `flag -> "true"`. */
final case class Args(m: Map[String, String]) {
  def get(k: String): Option[String] = m.get(k)
  def getOrElse(k: String, d: String): String = m.getOrElse(k, d)
  def has(k: String): Boolean = m.contains(k)
}

object Args {
  def apply(args: Array[String]): Args = {
    val b = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val k = a.drop(2)
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          b += k -> args(i + 1); i += 2
        } else { b += k -> "true"; i += 1 }
      } else i += 1
    }
    Args(b.result())
  }
}
