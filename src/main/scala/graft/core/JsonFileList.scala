package graft.core

/** Serialization of the `{"files": ["...", ...]}` documents used by the
  * table's snapshot manifests and the streaming source's seen-files
  * log. The parser is a single linear scan — NOT a regex: a
  * backtracking `(alternation)*` group recurses per character and
  * overflows the stack at the file counts these documents reach
  * (10⁴–10⁶ names at 100 TB table sizes). Only the CONTENTS of the
  * `"files"` array are read, so a file name containing a quoted token
  * elsewhere in the document can't corrupt the list.
  */
object JsonFileList {

  def render(files: Seq[String]): String =
    files.sorted.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("{\"files\": [", ", ", "]}")

  def parse(json: String): Seq[String] = {
    val key = json.indexOf("\"files\"")
    if (key < 0) return Seq.empty
    val start = json.indexOf('[', key + 7)
    if (start < 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var done = false
    var i = start + 1
    while (i < json.length && !done) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < json.length) { sb.append(json.charAt(i + 1)); i += 1 }
        else if (c == '"') { out += sb.toString(); sb.clear(); inStr = false }
        else sb.append(c)
      } else {
        if (c == '"') inStr = true
        else if (c == ']') done = true
      }
      i += 1
    }
    out.toSeq
  }
}
