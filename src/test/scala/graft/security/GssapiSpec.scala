package graft.security

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** GSSAPI principal-to-local rule engine against the reference's own
  * test corpus (security/tests/gssapi_principal_mapper_test.cc), with
  * the column fold checked identical to the single-name path. */
class GssapiSpec extends SparkSpec {
  import spark.implicits._

  private val setA = (Gssapi.parseRules(Seq(
    "RULE:[1:$1](App\\..*)s/App\\.(.*)/$1/g",
    "RULE:[2:$1](App\\..*)s/App\\.(.*)/$1/g",
    "RULE:[2:$1data$2](redpanda.*)",
    "DEFAULT")), "REALM.com")
  private val setB = (Gssapi.parseRules(Seq(
    "RULE:[1:$1]/L",
    "RULE:[2:$1](Test.*)s/ABC///L",
    "RULE:[2:$1](ABC.*)s/ABC/XYZ/g/L",
    "RULE:[2:$1](App\\..*)s/App\\.(.*)/$1/g/L",
    "RULE:[2:$1]/L",
    "DEFAULT")), "REALM.COM")
  private val setC = (Gssapi.parseRules(Seq(
    "RULE:[1:$1]/U",
    "RULE:[2:$1](Test.*)s/ABC///U",
    "RULE:[2:$1](ABC.*)s/ABC/XYZ/g/U",
    "RULE:[2:$1](App\\..*)s/App\\.(.*)/$1/g/U",
    "RULE:[2:$1]/U",
    "DEFAULT")), "REALM.COM")

  // (set, principal, expected local name) — gssapi_principal_mapper_test.cc
  private val vectors: Seq[(String, String, String)] = Seq(
    ("A", "App.service-name/example.com@REALM.com", "service-name"),
    ("A", "App.service-name@REALM.com", "service-name"),
    ("A", "user/host@REALM.com", "user"),
    ("A", "redpanda/example.com@REALM.com", "redpandadataexample.com"),
    ("B", "User@REALM.com", "user"),
    ("B", "TestABC/host@FOO.COM", "test"),
    ("B", "ABC_User_ABC/host@FOO.COM", "xyz_user_xyz"),
    ("B", "App.SERVICE-name/example.com@REALM.COM", "service-name"),
    ("B", "User/root@REALM.COM", "user"),
    ("C", "User@REALM.com", "USER"),
    ("C", "TestABC/host@FOO.COM", "TEST"),
    ("C", "ABC_User_ABC/host@FOO.COM", "XYZ_USER_XYZ"),
    ("C", "App.SERVICE-name/example.com@REALM.COM", "SERVICE-NAME"),
    ("C", "User/root@REALM.COM", "USER"))

  private val sets = Map("A" -> setA, "B" -> setB, "C" -> setC)

  test("name parsing: primary/host/realm, host-less, realm-less, malformed") {
    assert(Gssapi.parseName("App.service-name/example.com@REALM.com")
      === Some(Gssapi.Name("App.service-name", "example.com", "REALM.com")))
    assert(Gssapi.parseName("user@REALM.com") === Some(Gssapi.Name("user", "", "REALM.com")))
    assert(Gssapi.parseName("user") === Some(Gssapi.Name("user", "", "")))
    // an '@' that doesn't full-match the name grammar is malformed
    assert(Gssapi.parseName("a/b/c@R") === None)
    assert(Gssapi.parseName("@R") === None)
  }

  test("reference corpus: single-name path reproduces every pinned vector") {
    for ((tag, principal, want) <- vectors) {
      val (rules, realm) = sets(tag)
      val got = Gssapi.parseName(principal).flatMap(Gssapi.applyOne(realm, rules, _))
      assert(got === Some(want), s"$tag $principal")
    }
  }

  test("column fold matches the single-name path on the corpus") {
    for ((tag, (rules, realm)) <- sets) {
      val in = vectors.filter(_._1 == tag).map(_._2).toDF("gssapi_name")
      val got = Gssapi.mapPrincipals(in, col("gssapi_name"), realm, rules)
        .select("gssapi_name", "principal").as[(String, String)].collect().toMap
      for ((_, principal, want) <- vectors.filter(_._1 == tag))
        assert(got(principal) === want, s"$tag $principal")
    }
  }

  test("no applicable rule yields no principal; non-simple results are rejected") {
    val (rules, _) = setA
    // realm mismatch + no RULE matches -> None (connection refused)
    val n = Gssapi.parseName("someone@OTHER.REALM").get
    assert(Gssapi.applyOne("REALM.com", rules, n) === None)
    // a rule that rebuilds a non-simple name (contains '/') must not apply
    val slashRules = Gssapi.parseRules(Seq("RULE:[2:$1/$2]", "DEFAULT"))
    val m = Gssapi.parseName("user/host@REALM.com").get
    assert(Gssapi.applyOne("REALM.com", slashRules, m) === Some("user"))
  }

  test("invalid rules throw, as validate_kerberos_mapping_rules") {
    for (bad <- Seq("default", "DEFAUL", "DEFAULT/L", "rule:[1:$1]", "RULE:[1:$1/L"))
      assertThrows[IllegalArgumentException](Gssapi.parseRules(Seq(bad)))
  }
}
