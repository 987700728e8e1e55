package graft.sinks

import java.io.ByteArrayOutputStream

import Wire.{Buf, Fixed32, LengthDelimited}

/** carbonapi protobuf sinks (S6/S7) — byte-for-byte the reference's
  * hand-rolled encoders (`render/reply/v2_pb.go:55-120`,
  * `render/reply/v3_pb.go:90-173`); no protobuf library needed, the
  * messages are flat.
  */
object ProtobufSink {

  /** carbonapi_v2_pb FetchResponse: name=1, startTime=2, stopTime=3,
    * stepTime=4, values=5 (packed double), isAbsent=6 (packed bool);
    * wrapped as repeated metrics=1 of MultiFetchResponse.
    */
  def encodeV2(series: Seq[Series]): Array[Byte] = {
    val out = new ByteArrayOutputStream(65536)
    series.foreach { s =>
      val b1 = new Buf
      b1.string(1, s.name)
      b1.tag(2, 0).varint(s.start)
      b1.tag(3, 0).varint(s.stop)
      b1.tag(4, 0).varint(s.step)
      b1.tag(5, LengthDelimited).varint(8L * s.values.length)
      val b2 = new Buf
      b2.tag(6, LengthDelimited).varint(s.values.length.toLong)
      s.values.foreach { v =>
        if (v.isNaN) { b1.doubleLE(0.0); b2.byte(1) }
        else { b1.doubleLE(v); b2.byte(0) }
      }
      val hdr = new Buf
      hdr.tag(1, LengthDelimited).varint((b1.size + b2.size).toLong)
      out.write(hdr.bytes); out.write(b1.bytes); out.write(b2.bytes)
    }
    out.toByteArray
  }

  /** carbonapi_v3_pb FetchResponse: name=1, pathExpression=2,
    * consolidationFunc=3, startTime=4, stopTime=5, stepTime=6,
    * xFilesFactor=7 (float), highPrecisionTimestamps=8 (bool),
    * values=9 (packed double, NaN carried as-is), requestStartTime=11,
    * requestStopTime=12; wrapped as repeated metrics=1.
    */
  def encodeV3(series: Seq[Series], requestFrom: Long, requestUntil: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(65536)
    series.foreach { s =>
      val b = new Buf
      b.string(1, s.name)
      b.string(2, s.pathExpression)
      b.string(3, s.function)
      b.tag(4, 0).varint(s.start)
      b.tag(5, 0).varint(s.stop)
      b.tag(6, 0).varint(s.step)
      b.tag(7, Fixed32).floatLE(0.0f)
      b.tag(8, 0).byte(0)
      b.tag(9, LengthDelimited).varint(8L * s.values.length)
      s.values.foreach(b.doubleLE)
      b.tag(11, 0).varint(requestFrom)
      b.tag(12, 0).varint(requestUntil)
      val hdr = new Buf
      hdr.tag(1, LengthDelimited).varint(b.size.toLong)
      out.write(hdr.bytes); out.write(b.bytes)
    }
    out.toByteArray
  }
}
