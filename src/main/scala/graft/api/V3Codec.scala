package graft.api

import graft.sinks.Wire

/** Client-side carbonapi_v3_pb codec — the counterpart of the server's
  * request parser and the ProtobufSink encoder, used by tests and any
  * Scala client driving the HTTP surface (public
  * go-graphite/protocol carbonapi_v3_pb.proto field numbers).
  */
object V3Codec {

  final case class Fetch(
      name: String,
      pathExpression: String,
      consolidationFunc: String,
      start: Long,
      stop: Long,
      step: Long,
      requestStart: Long,
      requestStop: Long,
      values: Seq[Double])

  /** MultiFetchRequest{repeated FetchRequest metrics=1}. */
  def buildRequest(
      metrics: Seq[(String, Long, Long, Long, Seq[HttpApi.FilteringFunction])]): Array[Byte] = {
    val out = new Wire.Buf
    metrics.foreach { case (target, from, until, mdp, ffs) =>
      val fr = new Wire.Buf
      fr.string(1, target)
      fr.tag(2, 0).varint(from)
      fr.tag(3, 0).varint(until)
      fr.string(5, target)
      if (mdp > 0) fr.tag(6, 0).varint(mdp)
      ffs.foreach { ff =>
        val b = new Wire.Buf
        b.string(1, ff.name)
        ff.arguments.foreach(a => b.string(2, a))
        fr.tag(7, Wire.LengthDelimited).varint(b.size.toLong).raw(b.bytes)
      }
      out.tag(1, Wire.LengthDelimited).varint(fr.size.toLong).raw(fr.bytes)
    }
    out.bytes
  }

  /** MultiFetchResponse{repeated FetchResponse metrics=1} decode
    * (field layout per `ProtobufSink.encodeV3`).
    */
  def decodeResponse(body: Array[Byte]): Seq[Fetch] = {
    val out = Seq.newBuilder[Fetch]
    val rd = new Wire.Reader(body)
    while (rd.hasNext) {
      val (f, w) = rd.nextField()
      if (f == 1 && w == Wire.LengthDelimited) {
        val m = rd.lengthDelimited()
        var name = ""; var path = ""; var fn = ""
        var start = 0L; var stop = 0L; var step = 0L
        var reqStart = 0L; var reqStop = 0L
        val values = Seq.newBuilder[Double]
        while (m.hasNext) {
          val (f2, w2) = m.nextField()
          f2 match {
            case 1 => name = m.stringValue()
            case 2 => path = m.stringValue()
            case 3 => fn = m.stringValue()
            case 4 => start = m.varint()
            case 5 => stop = m.varint()
            case 6 => step = m.varint()
            case 9 =>
              val vals = m.lengthDelimited()
              while (vals.hasNext) values += vals.doubleLE()
            case 11 => reqStart = m.varint()
            case 12 => reqStop = m.varint()
            case _  => m.skip(w2)
          }
        }
        out += Fetch(name, path, fn, start, stop, step, reqStart, reqStop, values.result())
      } else rd.skip(w)
    }
    out.result()
  }
}
