package graft.sinks

import java.io.ByteArrayOutputStream

import Wire.{Buf, LengthDelimited}

/** Find-endpoint wire formats (`find/find.go:50-245`): pickle list of
  * `{metric_path, isLeaf}` dicts and the GlobResponse protobuf
  * (`name = 1; repeated GlobMatch{path = 1, isLeaf = 2} matches = 2`),
  * shared by the v2 and v3 carbonapi protocols.
  */
object FindSink {

  /** Pickle body: `[{metric_path: ..., isLeaf: bool}, ...]`; empty →
    * the canonical empty list.
    */
  def pickle(rows: Seq[(String, Boolean)]): Array[Byte] = {
    if (rows.isEmpty) return PickleSink.emptyList
    val out = new ByteArrayOutputStream(4096)
    out.write(0x80); out.write(2); out.write(']')
    rows.foreach { case (path, isLeaf) =>
      out.write('}')
      writeStr(out, "metric_path"); writeStr(out, path); out.write('s')
      writeStr(out, "isLeaf")
      out.write(if (isLeaf) 0x88 else 0x89) // NEWTRUE 0x88 / NEWFALSE 0x89
      out.write('s')
      out.write('a')
    }
    out.write('.')
    out.toByteArray
  }

  private def writeStr(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    out.write('X')
    out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
    out.write((b.length >> 16) & 0xff); out.write((b.length >> 24) & 0xff)
    out.write(b, 0, b.length)
  }

  /** GlobResponse protobuf (identical field layout in carbonapi v2
    * and v3).
    */
  def protobuf(query: String, rows: Seq[(String, Boolean)]): Array[Byte] = {
    val b = new Buf
    b.string(1, query)
    rows.foreach { case (path, isLeaf) =>
      val m = new Buf
      m.string(1, path)
      m.tag(2, 0).byte(if (isLeaf) 1 else 0)
      b.tag(2, LengthDelimited).varint(m.size.toLong).raw(m.bytes)
    }
    b.bytes
  }
}
