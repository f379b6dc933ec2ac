package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** One JVM-wide Hadoop Configuration for executor-side READ paths.
  *
  * Every graft FileFormat reader used to `new Configuration()` per FILE —
  * each of which re-parses core-default.xml/core-site.xml (the wstx XML
  * frames in the bench jstack profile) and re-resolves `fs.defaultFS`
  * (`FileSystem.getDefaultUri` was a top-5 runnable executor frame across
  * the 3–5 s query band). The fixture/table confs these readers need are
  * immutable defaults within a run, so one shared instance serves every
  * task; callers must treat it as READ-ONLY (Hadoop Configuration is
  * thread-safe for reads). Writers that need a task-scoped mutable conf
  * keep using `context.getConfiguration`.
  */
object SharedConf {
  lazy val get: Configuration = {
    val c = new Configuration()
    // keep the (scheme-keyed, impl-blind) FileSystem cache consistent: the
    // first file:// lookup in the JVM decides which class everyone gets, so
    // this conf must agree with Sessions.builder's spark.hadoop.fs.file.impl
    if (!sys.env.contains("SPARK_GRAFT_STOCK_LOCALFS"))
      c.set("fs.file.impl", classOf[FastLocalFileSystem].getName)
    c
  }
}

/** Local filesystem without the per-file `chmod` process fork.
  *
  * Without libhadoop (NativeIO unavailable — the WARN NativeCodeLoader
  * banner), `RawLocalFileSystem.setPermission` shells out to `chmod` for
  * every file CREATE and permissioned mkdir. A bench jstack profile showed
  * `Shell.runCommand` under `setPermission` as a recurring runnable frame:
  * thousands of output files per run (dynamic partitions, merges,
  * checkpoints) each paid a process fork. Single-user sandbox ⇒ permission
  * bits on warehouse files carry no information here; on a real cluster
  * the warehouse lives on HDFS/S3 where `fs.file.impl` is irrelevant and
  * permissions are handled natively by the DFS, so a no-op is safe at both
  * scales. Write-side CRC sidecar files (.<name>.crc — a SECOND create +
  * fork per file) are also skipped by default: local-FS checksums guard
  * against disk corruption between a write and a read in the same bench
  * run, which parquet/RCFile already checksum internally; set
  * `graft.localfs.write.checksum=true` in the Hadoop conf to restore them.
  *
  * Installed via `spark.hadoop.fs.file.impl` in Sessions.builder (env
  * SPARK_GRAFT_STOCK_LOCALFS=1 opts out).
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem) {
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setWriteChecksum(conf.getBoolean("graft.localfs.write.checksum", false))
  }
}
