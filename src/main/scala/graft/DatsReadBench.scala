package graft

import scala.jdk.CollectionConverters._

/** Peak-heap measurement for the S15 reader's r17 streaming parse vs the
  * r16 whole-document readTree shape, on an AGR-class (~hundreds of MB)
  * document. The number this main prints backs DatsJsonReader's Scaladoc
  * claim — rerun it if the parse changes.
  *
  * The document is emitted with a streaming JsonGenerator in the exact
  * grammar [[graft.io.DatsJsonWriter]] produces (one study-linked
  * dataset, subject members under producedBy→hasPart→hasMember,
  * extract→sample→subject derivesFrom chains under isAbout, file
  * datasets with distributions/dimensions/acquisitions under hasPart) —
  * the K1 writer itself can't emit a corpus this large from a fixture
  * graph, and a generator is constant-memory, so the measurement isolates
  * the READER's footprint.
  *
  * Usage: runMain graft.DatsReadBench [nSubjects] [docPath]
  *        (default 60000 subjects → ~5 files each → ~360 MB)
  */
object DatsReadBench {

  private def heapPools = java.lang.management.ManagementFactory
    .getMemoryPoolMXBeans.asScala
    .filter(_.getType == java.lang.management.MemoryType.HEAP)

  /** Peak heap high-water (bytes, summed pool peaks) while running `f`,
    * from a GC'd + reset baseline. Pool peaks are tracked by the JVM
    * through collections, so a transient spike is not lost to a later
    * GC. */
  private def peakDuring[T](f: => T): (T, Long) = {
    System.gc()
    heapPools.foreach(_.resetPeakUsage())
    val r = f
    (r, heapPools.map(_.getPeakUsage.getUsed).sum)
  }

  private def writeDoc(path: String, nSubjects: Int): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val gen = mapper.getFactory.createGenerator(
      new java.io.File(path), com.fasterxml.jackson.core.JsonEncoding.UTF8)
    val filesPer = 5
    def material(id: String, name: String, role: String,
        derivesFrom: Option[String], chars: Int): Unit = {
      gen.writeStartObject()
      gen.writeStringField("@type", "Material")
      gen.writeStringField("@id", id)
      gen.writeStringField("name", name)
      gen.writeFieldName("roles")
      gen.writeStartArray()
      gen.writeStartObject(); gen.writeStringField("value", role); gen.writeEndObject()
      gen.writeEndArray()
      derivesFrom.foreach { d =>
        gen.writeFieldName("derivesFrom")
        gen.writeStartArray()
        gen.writeStartObject(); gen.writeStringField("@id", d); gen.writeEndObject()
        gen.writeEndArray()
      }
      if (chars > 0) {
        gen.writeFieldName("characteristics")
        gen.writeStartArray()
        (0 until chars).foreach { c =>
          gen.writeStartObject()
          gen.writeStringField("identifier", s"phv0000$c")
          gen.writeStringField("name", s"Char_$c")
          gen.writeStringField("value", s"v${id.length + c}")
          gen.writeEndObject()
        }
        gen.writeEndArray()
      }
      gen.writeEndObject()
    }
    gen.writeStartObject()
    gen.writeStringField("@type", "Dataset")
    gen.writeStringField("@id", "D0")
    gen.writeStringField("title", "heap-bench instance")
    gen.writeFieldName("identifier")
    gen.writeStartObject(); gen.writeStringField("identifier", "phs000000"); gen.writeEndObject()
    gen.writeFieldName("producedBy")
    gen.writeStartObject()
    gen.writeStringField("@type", "Study")
    gen.writeStringField("@id", "ST0")
    gen.writeStringField("name", "bench study")
    gen.writeFieldName("hasPart")
    gen.writeStartArray()
    gen.writeStartObject()
    gen.writeStringField("@type", "StudyGroup")
    gen.writeStringField("@id", "G0")
    gen.writeStringField("name", "all subjects")
    gen.writeFieldName("hasMember")
    gen.writeStartArray()
    (0 until nSubjects).foreach(i =>
      material(s"SUBJ$i", s"SUB-$i", "donor", None, chars = 3))
    gen.writeEndArray()
    gen.writeEndObject()
    gen.writeEndArray()
    gen.writeEndObject()
    // extract chain: extract → sample (full node at first occurrence) →
    // subject idref; then the file datasets reference extracts as idrefs
    gen.writeFieldName("isAbout")
    gen.writeStartArray()
    (0 until nSubjects).foreach { i =>
      (0 until filesPer).foreach { j =>
        gen.writeStartObject()
        gen.writeStringField("@type", "Material")
        gen.writeStringField("@id", s"EXT${i}_$j")
        gen.writeStringField("name", s"EX-${i}_$j")
        gen.writeFieldName("roles")
        gen.writeStartArray()
        gen.writeStartObject()
        gen.writeStringField("value", if (j % 2 == 0) "DNA extract" else "RNA extract")
        gen.writeEndObject()
        gen.writeEndArray()
        gen.writeFieldName("derivesFrom")
        gen.writeStartArray()
        if (j == 0) material(s"SAMP$i", s"SM-$i", "specimen", Some(s"SUBJ$i"), chars = 2)
        else { gen.writeStartObject(); gen.writeStringField("@id", s"SAMP$i"); gen.writeEndObject() }
        gen.writeEndArray()
        gen.writeEndObject()
      }
    }
    gen.writeEndArray()
    gen.writeFieldName("hasPart")
    gen.writeStartArray()
    (0 until nSubjects).foreach { i =>
      (0 until filesPer).foreach { j =>
        gen.writeStartObject()
        gen.writeStringField("@type", "Dataset")
        gen.writeStringField("@id", s"F${i}_$j")
        gen.writeFieldName("types")
        gen.writeStartArray()
        gen.writeStartObject()
        gen.writeStringField("value", if (j % 2 == 0) "WGS" else "RNA-Seq")
        gen.writeEndObject()
        gen.writeEndArray()
        gen.writeFieldName("dimensions")
        gen.writeStartArray()
        gen.writeStartObject()
        gen.writeStringField("@type", "Dimension")
        gen.writeStringField("@id", s"MD${i}_$j")
        gen.writeStringField("name", "MD5")
        gen.writeStringField("values", f"${i * 31 + j}%032x")
        gen.writeEndObject()
        gen.writeEndArray()
        gen.writeFieldName("distributions")
        gen.writeStartArray()
        Seq("s3", "gs").foreach { scheme =>
          gen.writeStartObject()
          gen.writeStringField("@type", "DatasetDistribution")
          gen.writeStringField("@id", s"DD${scheme}${i}_$j")
          gen.writeFieldName("access")
          gen.writeStartObject()
          gen.writeStringField("landingPage", s"$scheme://bench-bucket/F${i}_$j.cram")
          gen.writeEndObject()
          gen.writeNumberField("size", i.toLong * 1000 + j)
          gen.writeEndObject()
        }
        gen.writeEndArray()
        gen.writeFieldName("producedBy")
        gen.writeStartObject()
        gen.writeFieldName("input")
        gen.writeStartArray()
        gen.writeStartObject(); gen.writeStringField("@id", s"EXT${i}_$j"); gen.writeEndObject()
        gen.writeEndArray()
        gen.writeEndObject()
        gen.writeEndObject()
      }
    }
    gen.writeEndArray()
    gen.writeEndObject()
    gen.close()
  }

  def main(args: Array[String]): Unit = {
    val nSubjects = args.lift(0).map(_.toInt).getOrElse(60000)
    val doc = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("dats_read_bench_").toString + "/doc.json")
    val spark = Tables.session("dats-read-bench",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    writeDoc(doc, nSubjects)
    val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(doc))

    // r17 shape first (cleaner heap): the whole shipped read() —
    // INCLUDING the entity row buffers the old shape would ALSO have
    // paid after its parse. Row count read inside the block; the graph
    // drops out of scope after it so the second measurement starts
    // unencumbered.
    val (rows, streamPeak) = peakDuring {
      val g = graft.io.DatsJsonReader.read(spark, doc)
      g.materials.count()
    }
    // r16 shape: whole-document string + full node tree held live WHILE
    // the entity row buffers build (exactly the old read()'s residency —
    // its tree walk kept the root reachable until the buffers were
    // complete). The buffer build is the shipped reader re-run; both
    // stay reachable to the end of the block, neither beyond it.
    val (treeNodes, treePeak) = peakDuring {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(doc)))
      val g = graft.io.DatsJsonReader.read(spark, doc)
      root.size() + g.materials.columns.length
    }
    println(s"""{"doc_bytes":$bytes,"readtree_peak_bytes":$treePeak,""" +
      s""""streaming_peak_bytes":$streamPeak,""" +
      s""""ratio":${treePeak.toDouble / streamPeak},""" +
      s""""tree_top_level":$treeNodes,"materials_rows":$rows}""")
    spark.stop()
  }
}
