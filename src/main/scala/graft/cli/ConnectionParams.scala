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

  private[cli] val flagsWithValue = Set("--host", "--port", "--user", "--password", "--db")

  /** Left(message) on a malformed GRAFT_PORT instead of an uncaught
    * NumberFormatException — the env fallback gets the same friendly
    * diagnostic as the --port flag path (a stale bad env var would
    * otherwise crash every invocation, even ones passing --port).
    */
  def defaultOrError: Either[String, ConnectionParams] =
    sys.env.get("GRAFT_PORT").map(v => (v, v.toIntOption)) match {
      case Some((v, None)) => Left(s"GRAFT_PORT expects an integer, got '$v'")
      case other =>
        Right(ConnectionParams(
          host = sys.env.getOrElse("GRAFT_HOST", "localhost"),
          port = other.flatMap(_._2).getOrElse(5439),
          user = sys.env.getOrElse("GRAFT_USER", "graft"),
          password = sys.env.get("GRAFT_PASSWORD"),
          db = sys.env.get("GRAFT_DB")))
    }

  def default: ConnectionParams =
    defaultOrError.fold(m => throw new IllegalArgumentException(m), identity)

  /** Strip leading `--host H --port P --user U --password PW --db D` flags
    * (any subset, any order — but BEFORE the subcommand, like the
    * reference's click group) off `args`. Returns Left(message) on an
    * unknown leading option or missing/malformed value.
    */
  def parse(args: List[String]): Either[String, (ConnectionParams, List[String])] =
    defaultOrError.flatMap(parse(args, _))

  def parse(args: List[String],
            base: ConnectionParams): Either[String, (ConnectionParams, List[String])] =
    args match {
      case "--host" :: v :: rest => parse(rest, base.copy(host = v))
      case "--port" :: v :: rest =>
        v.toIntOption.toRight(s"--port expects an integer, got '$v'")
          .flatMap(p => parse(rest, base.copy(port = p)))
      case "--user" :: v :: rest => parse(rest, base.copy(user = v))
      case "--password" :: v :: rest => parse(rest, base.copy(password = Some(v)))
      case "--db" :: v :: rest => parse(rest, base.copy(db = Some(v)))
      // a KNOWN flag with nothing after it is missing its value; an unknown
      // leading --flag is unknown whether or not it is last (the old order
      // of these clauses misreported a final unknown flag as missing-value)
      case f :: Nil if flagsWithValue(f) =>
        Left(s"option $f is missing its value")
      case f :: _ if f.startsWith("--") && f != "--yes" =>
        Left(s"unknown option $f")
      case rest => Right((base, rest))
    }
}
