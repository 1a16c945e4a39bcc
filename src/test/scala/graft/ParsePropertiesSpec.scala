package graft

import graft.transform.TransformDsl
import graft.transform.managed.Zeek
import org.apache.spark.sql.functions._

/** Property-style tests (seeded random sampling) for the parsing
  * primitives that back the managed mappings: DN parsing (dnMap) and
  * generic key-value parsing, each checked against an independent Scala
  * model over randomized inputs — duplicates, arbitrary spacing, escaped
  * commas, valueless tokens.
  */
class ParsePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  private val dnKeys = Seq("CN", "C", "L", "O", "OU", "ST", "DC", "EMAIL")

  /** Render random DN components with random spacing + duplicate types. */
  private def randomDn(): String = {
    val n = 1 + rng.nextInt(6)
    (0 until n).map { _ =>
      val k = dnKeys(rng.nextInt(dnKeys.size))
      val v = "v" + rng.nextInt(50)
      val pre = if (rng.nextBoolean()) " " else ""
      s"$pre$k=$v"
    }.mkString(",")
  }

  /** Scala model of dnMap: strip escaped commas, split, keep entries with
    * '=', trim key and value, last value per key wins.
    */
  private def dnModel(s: String): Map[String, String] =
    s.replace("\\,", "").split(",", -1).toSeq
      .filter(_.contains("="))
      .map { e =>
        val i = e.indexOf('=')
        e.substring(0, i).trim -> e.substring(i + 1).trim
      }
      .foldLeft(Map.empty[String, String])(_ + _)

  test("dnMap matches the last-win model on randomized DNs") {
    val dns = (1 to 200).map(_ => randomDn()) :+
      "CN=x\\, Inc,O=y" :+ "OU=a, OU=b, CN=c" :+ "DC=a,DC=b" :+ "garbage" :+ ""
    val out = dns.toDF("dn")
      .select(col("dn"), Zeek.dnMap(col("dn")).as("m"))
      .collect()
    out.foreach { r =>
      val dn = r.getString(0)
      val got = Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)
      assert(got == dnModel(dn), s"dn=<$dn>")
    }
  }

  test("parseKeyValue matches the model on randomized pair strings") {
    def randomKv(): String = {
      val n = rng.nextInt(8)
      (0 until n).map { _ =>
        if (rng.nextInt(10) == 0) "bare" + rng.nextInt(5) // no separator
        else s"k${rng.nextInt(6)}=v${rng.nextInt(50)}"
      }.mkString(" ")
    }
    def model(s: String): Map[String, String] =
      s.split(" ", -1).toSeq.filter(_.contains("="))
        .map { e =>
          val i = e.indexOf('=')
          e.substring(0, i) -> e.substring(i + 1)
        }
        .foldLeft(Map.empty[String, String])(_ + _)
    val rows = (1 to 200).map(_ => randomKv())
    val out = rows.toDF("s")
      .select(col("s"), TransformDsl.parseKeyValue(col("s")).as("m"))
      .collect()
    out.foreach { r =>
      val s = r.getString(0)
      val got = Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)
      assert(got == model(s), s"s=<$s>")
    }
  }

  test("dnMap components survive the x509Dn/dnStruct projections") {
    // the struct projections must agree with the map they were built from
    val dns = (1 to 50).map(_ => randomDn())
    val out = dns.toDF("dn")
      .withColumn("m", Zeek.dnMap(col("dn")))
      .select(col("dn"), col("m"),
        Zeek.dnStruct(col("m")).as("s"), Zeek.x509Dn(col("m")).as("x"))
      .collect()
    out.foreach { r =>
      val m = Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)
      val s = r.getStruct(2)
      val x = r.getStruct(3)
      assert(Option(s.getAs[String]("common_name")) == m.get("CN"))
      assert(Option(s.getAs[String]("organizational_unit")) == m.get("OU"))
      val xCn = Option(x.getAs[scala.collection.Seq[String]]("common_name"))
        .map(_.toSeq)
      assert(xCn == m.get("CN").map(Seq(_)))
    }
  }
}
