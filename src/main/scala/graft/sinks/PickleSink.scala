package graft.sinks

import java.io.ByteArrayOutputStream

/** Pickle sink (S8) — the graphite-web exchange format: a
  * protocol-2 pickle of a list of dicts
  * `{name, pathExpression, step, values (None = absent), start, end}`
  * in the reference's key order (`render/reply/pickle.go:55-105`).
  * Hand-rolled opcode writer; loadable by python `pickle.loads`.
  */
object PickleSink {

  private val PROTO: Array[Byte] = Array(0x80.toByte, 2.toByte)

  final private class W {
    val out = new ByteArrayOutputStream(65536)

    def op(c: Char): Unit = out.write(c)

    def str(s: String): Unit = { // BINUNICODE
      val b = s.getBytes("UTF-8")
      op('X')
      writeIntLE(b.length)
      out.write(b, 0, b.length)
    }

    def uint(v: Long): Unit =
      if (v < 256) { op('K'); out.write(v.toInt) } // BININT1
      else if (v < 65536) { op('M'); out.write(v.toInt & 0xff); out.write((v.toInt >> 8) & 0xff) } // BININT2
      else if (v <= Int.MaxValue) { op('J'); writeIntLE(v.toInt) } // BININT
      else { // LONG1, little-endian two's complement
        op(0x8a.toChar)
        out.write(5)
        var x = v
        var i = 0
        while (i < 5) { out.write((x & 0xff).toInt); x >>= 8; i += 1 }
      }

    def float(v: Double): Unit = { // BINFLOAT (big-endian)
      op('G')
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 7
      while (i >= 0) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }

    def none(): Unit = op('N')

    private def writeIntLE(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
  }

  def encode(series: Seq[Series]): Array[Byte] = {
    val w = new W
    w.out.write(PICKLE_HEADER, 0, PICKLE_HEADER.length)
    w.op(']') // EMPTY_LIST
    series.foreach { s =>
      w.op('}') // EMPTY_DICT
      w.str("name"); w.str(s.name); w.op('s')
      w.str("pathExpression"); w.str(s.pathExpression); w.op('s')
      w.str("step"); w.uint(s.step); w.op('s')
      w.str("values"); w.op(']')
      if (s.values.nonEmpty) {
        w.op('(') // MARK
        s.values.foreach(v => if (v.isNaN) w.none() else w.float(v))
        w.op('e') // APPENDS
      }
      w.op('s')
      w.str("start"); w.uint(s.start); w.op('s')
      w.str("end"); w.uint(s.stop); w.op('s')
      w.op('a') // APPEND dict to list
    }
    w.op('.') // STOP
    w.out.toByteArray
  }

  private val PICKLE_HEADER = PROTO

  /** The empty response (`graphitePickle.EmptyList`). */
  val emptyList: Array[Byte] = Array(0x80.toByte, 2.toByte, ']'.toByte, '.'.toByte)
}
