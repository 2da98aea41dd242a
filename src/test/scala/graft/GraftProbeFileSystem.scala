package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A Hadoop FileSystem registered under the scheme `graftfs:` for
  * IndexStoreSpec — locally-backed (the sandbox's only durable medium)
  * but resolved through the Hadoop FS REGISTRY like any object-store
  * connector, so a store path of `graftfs:///…` exercises exactly the
  * code path a real non-local scheme would: `Path.getFileSystem`,
  * scheme-checked operations, no `java.io.File` shortcut possible
  * (a java.io.File of a `graftfs://` URI cannot exist). */
class GraftProbeFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
}
