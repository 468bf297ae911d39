package graft

import graft.secrets.Secrets
import org.scalatest.funsuite.AnyFunSuite

class SecretsSpec extends AnyFunSuite {

  test("s3 secret maps to fs.s3a conf") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "s3", "key_id" -> "AKID", "secret" -> "SK", "region" -> "us-east-1",
      "session_token" -> "TOK", "endpoint" -> "http://localhost:9000",
      "url_style" -> "path", "use_ssl" -> "false"))
    assert(conf("fs.s3a.access.key") === "AKID")
    assert(conf("fs.s3a.secret.key") === "SK")
    assert(conf("fs.s3a.session.token") === "TOK")
    assert(conf("fs.s3a.endpoint.region") === "us-east-1")
    assert(conf("fs.s3a.endpoint") === "http://localhost:9000")
    assert(conf("fs.s3a.path.style.access") === "true")
    assert(conf("fs.s3a.connection.ssl.enabled") === "false")
  }

  test("scope produces per-bucket conf") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "s3", "key_id" -> "AKID", "secret" -> "SK", "scope" -> "s3://mybucket/prefix"))
    assert(conf("fs.s3a.bucket.mybucket.access.key") === "AKID")
    assert(conf("fs.s3a.bucket.mybucket.secret.key") === "SK")
  }

  test("r2 account_id derives the endpoint") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "r2", "key_id" -> "K", "secret" -> "S", "account_id" -> "acct123"))
    assert(conf("fs.s3a.endpoint") === "https://acct123.r2.cloudflarestorage.com")
  }

  test("azure connection string parses into real ABFS account-key property") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "azure",
      "connection_string" -> "DefaultEndpointsProtocol=https;AccountName=myacct;AccountKey=sEcReT==;EndpointSuffix=core.windows.net"))
    assert(conf("fs.azure.account.key.myacct.dfs.core.windows.net") === "sEcReT==")
  }

  test("azure service principal maps to OAuth provider properties") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "azure", "account_name" -> "acct", "client_id" -> "cid",
      "client_secret" -> "cs", "tenant_id" -> "tid"))
    assert(conf("fs.azure.account.auth.type.acct.dfs.core.windows.net") === "OAuth")
    assert(conf("fs.azure.account.oauth2.client.id.acct.dfs.core.windows.net") === "cid")
    assert(conf("fs.azure.account.oauth2.client.endpoint.acct.dfs.core.windows.net")
      .contains("tid"))
  }

  test("azure abfss scope narrows to the account named in the scope URI") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "azure", "client_id" -> "cid", "client_secret" -> "cs", "tenant_id" -> "tid",
      "scope" -> "abfss://mycontainer@scopedacct.dfs.core.windows.net/prefix"))
    assert(conf("fs.azure.account.auth.type.scopedacct.dfs.core.windows.net") === "OAuth")
    assert(conf("fs.azure.account.oauth2.client.id.scopedacct.dfs.core.windows.net") === "cid")
    // nothing lands on the global (un-suffixed) properties
    assert(!conf.contains("fs.azure.account.auth.type"))
  }

  test("azure container-only scope falls back to the secret's own account") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "azure", "scope" -> "azure://mycontainer/path",
      "connection_string" -> "AccountName=connacct;AccountKey=KEY=="))
    assert(conf("fs.azure.account.key.connacct.dfs.core.windows.net") === "KEY==")
    assert(!conf.contains("fs.azure.account.key"))
  }

  test("azure container-only scope with no derivable account errors loudly") {
    val e = intercept[Secrets.InvalidSecretException] {
      Secrets.toHadoopConf(Map(
        "type" -> "azure", "scope" -> "azure://mycontainer/path", "client_id" -> "cid"))
    }
    assert(e.getMessage.contains("container-only scope"))
    assert(e.getMessage.contains("azure://mycontainer/path"))
  }

  test("gcs HMAC rides the s3 interop endpoint") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "gcs", "key_id" -> "HMACK", "secret" -> "HMACS"))
    assert(conf("fs.s3a.access.key") === "HMACK")
    assert(conf("fs.s3a.secret.key") === "HMACS")
    assert(conf("fs.s3a.endpoint") === "https://storage.googleapis.com")
    val scoped = Secrets.toHadoopConf(Map(
      "type" -> "gcs", "key_id" -> "K", "secret" -> "S", "scope" -> "gs://gbucket"))
    assert(scoped("fs.s3a.bucket.gbucket.access.key") === "K")
  }

  test("apply writes secret conf onto the live session's Hadoop configuration") {
    Secrets.apply(graft.engine.Engine.session("local[4]"), Map(
      "type" -> "s3", "key_id" -> "LIVEKEY", "secret" -> "LIVESECRET",
      "scope" -> "s3://livebucket/prefix"))
    val hc = graft.engine.Engine.session("local[4]").sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.bucket.livebucket.access.key") === "LIVEKEY")
    assert(hc.get("fs.s3a.bucket.livebucket.secret.key") === "LIVESECRET")
  }

  test("s3a reads route into the Hadoop FS layer (jar-absent deployments fail loudly there)") {
    // The s3a connector jar is absent in this container; what this pins is
    // that a read AFTER Secrets.apply reaches the Hadoop filesystem lookup
    // for the s3a scheme — the jar-present deployment inherits a tested
    // path: secret → per-bucket conf → FileSystem dispatch.
    val spark = graft.engine.Engine.session("local[4]")
    Secrets.apply(spark, Map(
      "type" -> "s3", "key_id" -> "K", "secret" -> "S", "scope" -> "s3://livebucket"))
    val e = intercept[Throwable] {
      spark.read.parquet("s3a://livebucket/some/table").collect()
    }
    def mentionsS3a(t: Throwable): Boolean =
      t != null && ((t.getMessage != null && t.getMessage.toLowerCase.contains("s3a"))
        || mentionsS3a(t.getCause))
    assert(mentionsS3a(e), s"expected the failure to come from the s3a FS lookup: $e")
  }

  test("s3a integration (capability-gated): mapped conf drives the deployed S3A filesystem") {
    // Offline containers ship no hadoop-aws jar, so this CANCELS with the
    // reason recorded; the day a jar-present deployment runs the suite, the
    // end-to-end wiring (scheme binding + per-bucket override pickup) is
    // asserted for real, with no network touched (static creds + endpoint).
    assume(graft.catalog.Formats.jarPresent("hadoop-aws"),
      "hadoop-aws jar not deployed in this container (offline); the conf " +
        "mapping itself is covered by the pure-function tests above")
    val conf = new org.apache.hadoop.conf.Configuration()
    (Secrets.toHadoopConf(Map("type" -> "s3", "key_id" -> "AKIT", "secret" -> "SKT",
      "endpoint" -> "http://localhost:9000", "url_style" -> "path", "use_ssl" -> "false"))
      ++ Secrets.toHadoopConf(Map("type" -> "s3", "key_id" -> "BKEY", "secret" -> "BSK",
        "scope" -> "s3://graft-it-bucket/x")))
      .foreach { case (k, v) => conf.set(k, v) }
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(
      new java.net.URI("s3a://graft-it-bucket/"), conf)
    try {
      assert(fs.getClass.getName.endsWith("S3AFileSystem"))
      assert(fs.getConf.get("fs.s3a.bucket.graft-it-bucket.access.key") === "BKEY")
      assert(fs.getConf.get("fs.s3a.endpoint") === "http://localhost:9000")
    } finally fs.close()
  }

  test("unknown option errors, listing valid ones (reference error shape)") {
    val e = intercept[Secrets.InvalidSecretException] {
      Secrets.toHadoopConf(Map("type" -> "s3", "bogus" -> "x"))
    }
    assert(e.getMessage.contains("bogus"))
    assert(e.getMessage.contains("valid options"))
  }

  test("missing type and unsupported type error") {
    intercept[Secrets.InvalidSecretException] { Secrets.toHadoopConf(Map("key_id" -> "x")) }
    intercept[Secrets.InvalidSecretException] { Secrets.toHadoopConf(Map("type" -> "ftp")) }
  }
}
