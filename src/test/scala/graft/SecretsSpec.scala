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

  test("azure connection string maps") {
    val conf = Secrets.toHadoopConf(Map(
      "type" -> "azure", "connection_string" -> "DefaultEndpointsProtocol=https;..."))
    assert(conf.contains("fs.azure.connection.string"))
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
