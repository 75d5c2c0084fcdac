import java.io.IOException;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem minus the fork storms.
 *
 * Without libhadoop, Hadoop's local filesystem shells out (fork+exec of
 * /bin/chmod etc.) for every setPermission -- and this sandbox's kernel makes
 * fork cost scale with JVM RSS, so each write job paid seconds of all-core
 * kernel time (see BASELINE.md "fork-cost / RSS pitfall"). POSIX permissions
 * are meaningless for a single-user scratch lake: no-op them.
 *
 * Registered via spark.hadoop.fs.file.impl when the compiled class is on the
 * driver classpath (cds_spark/session.py); falls back to the stock
 * RawLocalFileSystem otherwise.
 */
public class FastLocalFileSystem extends RawLocalFileSystem {
  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    // no-op: avoid fork+exec of chmod per file/dir
  }

  @Override
  public void setOwner(Path p, String username, String groupname) throws IOException {
    // no-op: avoid fork+exec of chown
  }
}
