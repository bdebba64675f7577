package graft.sources.native

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/**
 * Ships a Hadoop `Configuration` (not `java.io.Serializable` itself)
 * from the driver to executor-side reader/writer factories, so scans
 * and writes see the session's fs.* settings and credentials instead
 * of a bare `new Configuration()`.
 */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
