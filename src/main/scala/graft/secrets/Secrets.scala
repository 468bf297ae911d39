package graft.secrets

import org.apache.spark.sql.SparkSession

/** Credential option sets → Hadoop filesystem configuration.
  *
  * The reference turns user-mapping options into engine `CREATE SECRET`
  * statements (reference: src/duckdb/secret.rs:24-217). Spark's analogue is
  * Hadoop conf: `fs.s3a.*` for S3/R2/MinIO, `fs.gs.*` for GCS, `fs.azure.*`
  * for Azure. `scope` becomes per-bucket configuration
  * (`fs.s3a.bucket.<bucket>.*`), the standard way to hold many credentials
  * in one session — exactly the reference's SCOPE semantics.
  *
  * Pure function (options → conf map) so it is unit-testable offline; the
  * connector jars themselves are absent in this container (capability-gated,
  * see graft.catalog.Formats).
  */
object Secrets {

  final case class InvalidSecretException(msg: String) extends IllegalArgumentException(msg)

  /** Valid option keys per secret type (mirrors the reference's enum). */
  val validOptions: Map[String, Set[String]] = Map(
    "s3" -> Set("type", "key_id", "secret", "region", "session_token", "endpoint",
      "url_style", "use_ssl", "url_compatibility_mode", "scope", "provider", "chain"),
    "r2" -> Set("type", "key_id", "secret", "account_id", "scope", "provider"),
    "gcs" -> Set("type", "key_id", "secret", "scope", "provider"),
    "azure" -> Set("type", "connection_string", "account_name", "tenant_id", "client_id",
      "client_secret", "client_certificate_path", "http_proxy", "proxy_user_name",
      "proxy_password", "chain", "scope", "provider"))

  /** Options → Hadoop conf entries. Fails on unknown/missing options with the
    * reference's error shape (list the valid ones). */
  def toHadoopConf(options: Map[String, String]): Map[String, String] = {
    val typ = options.getOrElse("type",
      throw InvalidSecretException("secret option `type` is required (s3|r2|gcs|azure)"))
      .toLowerCase
    val valid = validOptions.getOrElse(typ,
      throw InvalidSecretException(
        s"unsupported secret type `$typ`; valid types: ${validOptions.keys.toSeq.sorted.mkString(", ")}"))
    options.keys.find(k => !valid.contains(k.toLowerCase)).foreach { k =>
      throw InvalidSecretException(
        s"invalid secret option `$k` for type `$typ`; valid options: ${valid.toSeq.sorted.mkString(", ")}")
    }
    val scopePrefix = options.get("scope").map(bucketPrefix(typ, _))
    def key(base: String): String = scopePrefix match {
      case Some(p) => p + base
      case None => prefixFor(typ) + base
    }
    typ match {
      case "s3" | "r2" =>
        val base = Seq(
          options.get("key_id").map(v => key("access.key") -> v),
          options.get("secret").map(v => key("secret.key") -> v),
          options.get("session_token").map(v => key("session.token") -> v),
          options.get("region").map(v => key("endpoint.region") -> v),
          options.get("endpoint").map(v => key("endpoint") -> v),
          options.get("url_style").map(v => key("path.style.access") -> (v == "path").toString),
          options.get("use_ssl").map(v => key("connection.ssl.enabled") -> v)).flatten
        val r2 = if (typ == "r2") options.get("account_id").toSeq.map(a =>
          key("endpoint") -> s"https://$a.r2.cloudflarestorage.com") else Seq()
        (base ++ r2).toMap
      case "gcs" =>
        // The reference's GCS secret is an HMAC pair over the S3
        // INTEROPERABILITY API (storage.googleapis.com) — duckdb's TYPE GCS
        // is s3-compatible under the hood (src/duckdb/secret.rs). The Hadoop
        // gcs-connector has no HMAC auth at all, so the faithful mapping is
        // S3A pointed at the interop endpoint, with per-bucket scoping.
        (Seq(
          options.get("key_id").map(v => key("access.key") -> v),
          options.get("secret").map(v => key("secret.key") -> v)).flatten ++ Seq(
          key("endpoint") -> "https://storage.googleapis.com",
          key("path.style.access") -> "true")).toMap
      case "azure" =>
        // Real ABFS (hadoop-azure) property names. An account key may arrive
        // inline or inside a connection string (`AccountName=..;AccountKey=..`);
        // service-principal creds map to the OAuth provider properties.
        //
        // SCOPE semantics: hadoop-azure holds credentials per storage ACCOUNT
        // (`fs.azure.account.key.<account>.dfs.core.windows.net`) — there is
        // no per-container conf convention. A scope therefore narrows to the
        // account derivable from the scope URI itself
        // (`abfss://container@account.dfs.core.windows.net/...`) or from the
        // secret's own account_name/connection string. A container-only scope
        // with no derivable account cannot be honored at ANY granularity —
        // error loudly rather than silently applying the secret globally.
        val scopedAccount = options.get("scope").map { sc =>
          azureScopeAccount(sc)
            .orElse(options.get("account_name"))
            .orElse(connStringField(options, "AccountName"))
            .getOrElse(throw InvalidSecretException(
              s"azure scope `$sc` names no storage account and the secret has no " +
                "account_name/connection_string; hadoop-azure scopes credentials per " +
                "account (fs.azure.account.key.<account>), so a container-only scope " +
                "cannot be honored"))
        }
        val account = scopedAccount
          .orElse(options.get("account_name"))
          .orElse(connStringField(options, "AccountName"))
        val suffix = account.map(a => s".$a.dfs.core.windows.net").getOrElse("")
        val accountKey = connStringField(options, "AccountKey")
        val oauth = options.get("client_id").map { cid =>
          Seq(
            s"fs.azure.account.auth.type$suffix" -> "OAuth",
            s"fs.azure.account.oauth.provider.type$suffix" ->
              "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
            s"fs.azure.account.oauth2.client.id$suffix" -> cid) ++
            options.get("client_secret").map(s"fs.azure.account.oauth2.client.secret$suffix" -> _) ++
            options.get("tenant_id").map(t =>
              s"fs.azure.account.oauth2.client.endpoint$suffix" ->
                s"https://login.microsoftonline.com/$t/oauth2/token")
        }.getOrElse(Seq.empty)
        (accountKey.map(k => s"fs.azure.account.key$suffix" -> k).toSeq ++ oauth).toMap
    }
  }

  private def prefixFor(typ: String): String = typ match {
    case "s3" | "r2" | "gcs" => "fs.s3a." // gcs rides the s3-interop endpoint
    case "azure" => "fs.azure."
  }

  /** SCOPE 's3://bucket/...' → per-bucket conf prefix fs.s3a.bucket.<b>. */
  private def bucketPrefix(typ: String, scope: String): String = {
    val bucket = scope.stripPrefix("s3://").stripPrefix("r2://").stripPrefix("gs://")
      .stripPrefix("gcs://").stripPrefix("azure://").takeWhile(_ != '/')
    if (bucket.isEmpty) throw InvalidSecretException(s"cannot parse bucket from scope `$scope`")
    typ match {
      case "s3" | "r2" | "gcs" => s"fs.s3a.bucket.$bucket."
      case _ => prefixFor(typ) // azure: no per-bucket conf convention; global
    }
  }

  /** Storage account named by an Azure scope URI, if any:
    * `abfss://container@account.dfs.core.windows.net/...` → `account`. The
    * reference's container-only shapes (`azure://container/...`, `az://...`)
    * carry no account — those return None and must find one elsewhere. */
  private def azureScopeAccount(scope: String): Option[String] = {
    val noScheme = scope.indexOf("://") match {
      case -1 => scope
      case i => scope.substring(i + 3)
    }
    val authority = noScheme.takeWhile(_ != '/')
    authority.indexOf('@') match {
      case -1 => None
      case i => Some(authority.substring(i + 1).takeWhile(_ != '.')).filter(_.nonEmpty)
    }
  }

  /** Pull a `Key=Value` field out of an Azure connection string option. */
  private def connStringField(options: Map[String, String], field: String): Option[String] =
    options.get("connection_string").flatMap {
      _.split(';').map(_.trim).collectFirst {
        case kv if kv.toLowerCase.startsWith(field.toLowerCase + "=") =>
          kv.substring(field.length + 1)
      }
    }

  /** Apply a secret to the live session's Hadoop configuration. */
  def apply(spark: SparkSession, options: Map[String, String]): Unit =
    toHadoopConf(options).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}
