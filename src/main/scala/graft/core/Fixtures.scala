package graft.core

/** Root for deterministic generated fixtures (FIXTURES.md). Lives under
  * `target/` so query builds never mutate the committed tree; overridable
  * via `-Dgraft.fixtures.dir` for environments where the working dir is
  * not the repo root. Oracle SQL interpolates these paths, so engine and
  * DuckDB always read the identical bytes.
  */
object Fixtures {
  val dir: String = sys.props.getOrElse(
    "graft.fixtures.dir",
    sys.props.getOrElse("user.dir", ".") + "/target/fixtures")

  def path(name: String): String = s"$dir/$name"
}
