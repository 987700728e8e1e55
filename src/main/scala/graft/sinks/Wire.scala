package graft.sinks

import java.io.ByteArrayOutputStream

/** Low-level wire-format helpers shared by the protobuf and pickle
  * sinks (`render/reply/protobuf.go:19-24` constants; varint/fixed64
  * are the standard protobuf encodings).
  */
object Wire {

  /** protobuf wire types */
  val LengthDelimited = 2
  val Fixed32 = 5

  final class Buf {
    val out = new ByteArrayOutputStream(4096)

    def varint(v: Long): this.type = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
      this
    }

    /** field header: (number << 3) | wireType */
    def tag(field: Int, wireType: Int): this.type = varint((field << 3) | wireType)

    def doubleLE(v: Double): this.type = {
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      this
    }

    def floatLE(v: Float): this.type = {
      var bits = java.lang.Float.floatToIntBits(v)
      var i = 0
      while (i < 4) { out.write(bits & 0xff); bits >>>= 8; i += 1 }
      this
    }

    def string(field: Int, s: String): this.type = {
      val b = s.getBytes("UTF-8")
      tag(field, LengthDelimited).varint(b.length.toLong)
      out.write(b, 0, b.length)
      this
    }

    def raw(b: Array[Byte]): this.type = { out.write(b, 0, b.length); this }
    def byte(b: Int): this.type = { out.write(b); this }

    def bytes: Array[Byte] = out.toByteArray
    def size: Int = out.size()
  }
}
