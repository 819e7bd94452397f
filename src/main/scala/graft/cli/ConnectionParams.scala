package graft.cli

/** Live-DB connection parameters (reference ConnectionParameters,
  * main.py:16-26: `--host --port --user --password --db` group options with
  * env-var fallbacks and defaults localhost/5439). Ours fall back to
  * GRAFT_HOST / GRAFT_PORT / GRAFT_USER / GRAFT_PASSWORD / GRAFT_DB.
  *
  * One deliberate divergence: the reference interactively prompts for the
  * password (its shipped profile spends 83% of CLI wall-clock in that
  * prompt, BASELINE.md) — here a missing password simply stays unset and
  * must arrive via --password or GRAFT_PASSWORD, keeping the CLI
  * non-interactive and scriptable.
  */
final case class ConnectionParams(
    host: String,
    port: Int,
    user: String,
    password: Option[String],
    db: Option[String]) {

  /** The JDBC URL the [[graft.sources.JdbcSource]] live path consumes.
    * A `--db` that is already a full `jdbc:` URL passes through verbatim
    * (how the Derby e2e plugs in); otherwise the standard postgres-wire
    * URL the reference's engine string points at (utils/redshift.py).
    */
  def jdbcUrl: String = db match {
    case Some(u) if u.startsWith("jdbc:") => u
    case d => s"jdbc:postgresql://$host:$port/${d.getOrElse("")}"
  }

  /** Credential options for the Spark JDBC reader. */
  def jdbcOptions: Map[String, String] =
    Map("user" -> user) ++ password.map("password" -> _)
}

object ConnectionParams {

  def default: ConnectionParams = ConnectionParams(
    host = sys.env.getOrElse("GRAFT_HOST", "localhost"),
    port = sys.env.get("GRAFT_PORT").map(_.toInt).getOrElse(5439),
    user = sys.env.getOrElse("GRAFT_USER", "graft"),
    password = sys.env.get("GRAFT_PASSWORD"),
    db = sys.env.get("GRAFT_DB"))

  /** Strip leading `--host H --port P --user U --password PW --db D` flags
    * (any subset, any order — but BEFORE the subcommand, like the
    * reference's click group) off `args`. Returns Left(message) on an
    * unknown leading option or missing/malformed value.
    */
  def parse(args: List[String],
            base: ConnectionParams = default): Either[String, (ConnectionParams, List[String])] =
    args match {
      case "--host" :: v :: rest => parse(rest, base.copy(host = v))
      case "--port" :: v :: rest =>
        v.toIntOption.toRight(s"--port expects an integer, got '$v'")
          .flatMap(p => parse(rest, base.copy(port = p)))
      case "--user" :: v :: rest => parse(rest, base.copy(user = v))
      case "--password" :: v :: rest => parse(rest, base.copy(password = Some(v)))
      case "--db" :: v :: rest => parse(rest, base.copy(db = Some(v)))
      case f :: Nil if f.startsWith("--") && f != "--yes" =>
        Left(s"option $f is missing its value")
      case f :: _ if f.startsWith("--") && f != "--yes" =>
        Left(s"unknown option $f")
      case rest => Right((base, rest))
    }
}
