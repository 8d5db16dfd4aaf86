package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.AnnSearch
import graft.sources.CsvMount

/** ScalaCheck properties for the driver-side pure functions (the Spark-side
  * twins are exercised by the DataFrame specs and the DuckDB oracle). */
object DriverFnProps extends Properties("driver-fns") {

  private val coord = Gen.chooseNum(-179.999, 179.999)

  property("parseWktPoint round-trips formatted points") =
    Prop.forAll(coord, coord) { (lon: Double, lat: Double) =>
      CsvMount.parseWktPoint(s"POINT($lon $lat)") == Some((lon, lat)) &&
        CsvMount.parseWktPoint(s"POINT ( $lon   $lat )") == Some((lon, lat))
    }

  property("parseWktPoint rejects non-points") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      CsvMount.parseWktPoint(s"LINESTRING($s)").isEmpty &&
        CsvMount.parseWktPoint(s).isEmpty
    }

  property("parseDatetimeMs: compact and ISO forms agree") =
    Prop.forAll(Gen.chooseNum(0L, 1767225599L)) { epochSec =>
      val i = java.time.Instant.ofEpochSecond(epochSec)
      val dt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
      val compact = f"${dt.getYear}%04d${dt.getMonthValue}%02d${dt.getDayOfMonth}%02d" +
        f"${dt.getHour}%02d${dt.getMinute}%02d${dt.getSecond}%02d"
      val iso = dt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss")) // LocalDateTime.toString would drop :00 seconds
      (CsvMount.parseDatetimeMs(compact), CsvMount.parseDatetimeMs(iso)) match {
        case (Some(a), Some(b)) => a == b && a == epochSec * 1000.0
        case _ => false
      }
    }

  property("signature8: in [0,256) and flips exactly with coordinate signs") =
    Prop.forAll(Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0).suchThat(_ != 0.0))) { v =>
      val sig = AnnSearch.signature8(v)
      val flipped = AnnSearch.signature8(v.map(-_))
      sig >= 0 && sig < 256 && (sig ^ flipped) == 255
    }
}
