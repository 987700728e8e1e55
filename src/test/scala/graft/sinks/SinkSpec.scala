package graft.sinks

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format sinks: carbonapi v2/v3 protobuf, pickle, JSON
  * (reference render/reply encoders, `find/find.go:200-245`).
  */
class SinkSpec extends AnyFunSuite {

  private val s1 = Series("m1", "m*", "avg", 60, 180, 60, Array(1.5, Double.NaN))
  private val s2 = Series("m2", "m*", "max", 60, 180, 60, Array(2.0, 3.0))

  // -- generic protobuf reader (independent of the encoder's writer) --
  private def parseFields(b: Array[Byte]): List[(Int, Int, Either[Long, Array[Byte]])] = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(i) & 0xff; i += 1; v |= (x & 0x7fL) << shift; shift += 7; (x & 0x80) != 0 }) ()
      v
    }
    val fields = List.newBuilder[(Int, Int, Either[Long, Array[Byte]])]
    while (i < b.length) {
      val key = varint()
      val field = (key >> 3).toInt
      val wt = (key & 7).toInt
      wt match {
        case 0 => fields += ((field, wt, Left(varint())))
        case 2 =>
          val len = varint().toInt
          fields += ((field, wt, Right(b.slice(i, i + len)))); i += len
        case 5 =>
          fields += ((field, wt, Right(b.slice(i, i + 4)))); i += 4
        case 1 =>
          fields += ((field, wt, Right(b.slice(i, i + 8)))); i += 8
      }
    }
    fields.result()
  }

  private def doublesLE(b: Array[Byte]): Seq[Double] =
    b.grouped(8).map { g =>
      var bits = 0L
      var i = 7
      while (i >= 0) { bits = (bits << 8) | (g(i) & 0xffL); i -= 1 }
      java.lang.Double.longBitsToDouble(bits)
    }.toSeq

  test("v3 protobuf layout") {
    val top = parseFields(ProtobufSink.encodeV3(Seq(s1, s2), 55, 185))
    assert(top.map(_._1) == List(1, 1)) // repeated metrics
    val m1 = parseFields(top.head._3.toOption.get)
    val byField = m1.groupBy(_._1)
    assert(new String(byField(1).head._3.toOption.get, "UTF-8") == "m1")
    assert(new String(byField(2).head._3.toOption.get, "UTF-8") == "m*")
    assert(new String(byField(3).head._3.toOption.get, "UTF-8") == "avg")
    assert(byField(4).head._3.left.toOption.contains(60L))
    assert(byField(5).head._3.left.toOption.contains(180L))
    assert(byField(6).head._3.left.toOption.contains(60L))
    val vals = doublesLE(byField(9).head._3.toOption.get)
    assert(vals.head == 1.5 && vals(1).isNaN) // NaN carried as-is in v3
    assert(byField(11).head._3.left.toOption.contains(55L))
    assert(byField(12).head._3.left.toOption.contains(185L))
  }

  test("v2 protobuf layout: zeros + isAbsent parallel array") {
    val top = parseFields(ProtobufSink.encodeV2(Seq(s1)))
    val m1 = parseFields(top.head._3.toOption.get)
    val byField = m1.groupBy(_._1)
    assert(new String(byField(1).head._3.toOption.get, "UTF-8") == "m1")
    val vals = doublesLE(byField(5).head._3.toOption.get)
    assert(vals == Seq(1.5, 0.0)) // NaN → 0 + isAbsent flag
    assert(byField(6).head._3.toOption.get.toSeq == Seq[Byte](0, 1))
  }

  test("pickle: deterministic protocol-2 bytes") {
    val b = PickleSink.encode(Seq(s1))
    assert(b(0) == 0x80.toByte && b(1) == 2.toByte && b.last == '.'.toByte)
    // known-good hex captured from a python pickle.loads round-trip
    // (tools/check_pickle.py) of this exact fixture
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/pickle_sample.bin"), b)
    assert(PickleSink.encode(Seq(s1)).toSeq == b.toSeq) // deterministic
    assert(PickleSink.emptyList.toSeq ==
      Seq(0x80.toByte, 2.toByte, ']'.toByte, '.'.toByte))
  }

  test("render JSON matches the reference's hand-built shape") {
    val json = JsonSink.render(Seq(s1), 55, 185)
    assert(json ==
      """{"metrics":[{"name":"m1","pathExpression":"m*","consolidationFunc":"avg",""" +
      """"startTime":60,"stopTime":180,"stepTime":60,"xFilesFactor":0.000000,""" +
      """"values":[1.500000,null],"requestStartTime":55,"requestStopTime":185}]}""")
    assert(JsonSink.render(Nil, 0, 0) == """{"metrics":[]}""")
  }

  test("find body: quirky reference format") {
    assert(JsonSink.find(Seq(("a.b", true), ("a.c", false))) ==
      "[{path=\"a.b\",leaf=1},{path=\"a.c\"}]\r\n")
    assert(JsonSink.find(Nil) == "")
    assert(JsonSink.find(Seq(("a", true), ("b", true)), resultsLimit = 1) ==
      "[{path=\"a\",leaf=1}]\r\n")
  }

  test("find pickle: loadable protocol-2 list of dicts") {
    val b = FindSink.pickle(Seq(("a.b", true), ("a.c", false)))
    assert(b(0) == 0x80.toByte && b.last == '.'.toByte)
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/find_pickle_sample.bin"), b)
    assert(FindSink.pickle(Nil).toSeq == PickleSink.emptyList.toSeq)
  }

  test("find protobuf: GlobResponse layout") {
    val fields = parseFields(FindSink.protobuf("a.*", Seq(("a.b", true), ("a.c", false))))
    assert(new String(fields.head._3.toOption.get, "UTF-8") == "a.*")
    val matches = fields.filter(_._1 == 2).map(f => parseFields(f._3.toOption.get))
    assert(matches.length == 2)
    assert(new String(matches.head.head._3.toOption.get, "UTF-8") == "a.b")
    assert(matches.head(1)._3.left.toOption.contains(1L))
    assert(matches(1)(1)._3.left.toOption.contains(0L))
  }

  test("autocomplete JSON array") {
    assert(JsonSink.autocomplete(Seq("env", "host")) == """["env","host"]""")
    assert(JsonSink.autocomplete(Nil) == "[]")
  }
}
