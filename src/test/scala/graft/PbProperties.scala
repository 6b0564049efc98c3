// in the sources package: GrpcWire is private[sources] (the codec is an
// implementation detail of the transport pair, not API)
package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip properties of the hand-rolled protobuf wire codec — the
  * binary transport's foundation must hold for EVERY value, not just
  * the fixtures' (varint edge lengths, NaN/±0.0 doubles, empty and
  * unicode strings, empty arrays, arbitrary nesting of point fields).
  */
object PbProperties extends Properties("graft.pb") {

  property("varint round-trips every non-negative long") =
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val r = new PbReader(new PbWriter().int(1, v).toBytes)
      r.readTag()
      r.readRawVarint() == v
    }

  property("fixed64 doubles round-trip bit-exactly (NaN, -0.0 included)") =
    forAll(Gen.oneOf(
      Gen.chooseNum(Double.MinValue, Double.MaxValue),
      Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MinPositiveValue))) { d =>
      val r = new PbReader(new PbWriter().double(1, d).toBytes)
      r.readTag()
      java.lang.Double.doubleToLongBits(r.readDouble()) ==
        java.lang.Double.doubleToLongBits(d)
    }

  property("strings round-trip through UTF-8 length-delimited fields") =
    forAll { (s: String) =>
      val r = new PbReader(new PbWriter().string(1, s).toBytes)
      r.readTag()
      r.readString() == s
    }

  property("packed float/double/int runs round-trip, empties included") =
    forAll(Gen.listOf(Gen.chooseNum(-1e30f, 1e30f)),
           Gen.listOf(Gen.chooseNum(-1e300, 1e300)),
           Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue))) {
      (fs, ds, is) =>
        val w = new PbWriter().packedFloats(1, fs.toArray)
          .packedDoubles(2, ds.toArray).packedInts(3, is.toArray)
        val r = new PbReader(w.toBytes)
        r.readTag(); val gf = r.readPackedFloats().toSeq
        r.readTag(); val gd = r.readPackedDoubles().toSeq
        r.readTag(); val gi = r.readPackedInts().toSeq
        gf == fs && gd == ds && gi == is
    }

  private val genPoint: Gen[Point] = for {
    id <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    payload <- Gen.option(Gen.oneOf("""{"a":1}""", "", """{"s":"x y"}"""))
    nd <- Gen.chooseNum(0, 2)
    dense <- Gen.listOfN(nd, for {
      n <- Gen.alphaStr.suchThat(_.nonEmpty)
      v <- Gen.listOf(Gen.chooseNum(-10f, 10f))
    } yield n -> v.toArray)
    ns <- Gen.chooseNum(0, 1)
    sparse <- Gen.listOfN(ns, for {
      n <- Gen.alphaStr.suchThat(_.nonEmpty)
      k <- Gen.chooseNum(0, 4)
      di <- Gen.listOfN(k, Gen.chooseNum(0, 1000))
      dv <- Gen.listOfN(k, Gen.chooseNum(-10f, 10f))
    } yield n -> ((di.toArray, dv.toArray)))
    nm <- Gen.chooseNum(0, 1)
    multi <- Gen.listOfN(nm, for {
      n <- Gen.alphaStr.suchThat(_.nonEmpty)
      rows <- Gen.listOf(Gen.listOfN(2, Gen.chooseNum(-10f, 10f)))
    } yield n -> rows.map(_.toArray).toArray)
  } yield Point(id, payload, dense.toMap, multi.toMap, sparse.toMap)

  private def key(p: Point) = (p.id, p.payload,
    p.dense.view.mapValues(_.toSeq).toMap,
    p.multi.view.mapValues(_.map(_.toSeq).toSeq).toMap,
    p.sparse.view.mapValues { case (i, v) => (i.toSeq, v.toSeq) }.toMap)

  property("points round-trip through the wire message, payload presence exact") =
    forAll(genPoint) { p =>
      key(GrpcWire.decodePoint(new PbReader(GrpcWire.encodePoint(p).toBytes))) == key(p)
    }
}
