package graft

import graft.functions.DiffUtils
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {

  val v1 = "As a user\nI want login\nSo that access\nEnd"
  val diff =
    """@@ -1,4 +1,5 @@
      | As a user
      |-I want login
      |+I want SSO login
      |+With 2FA
      | So that access
      | End""".stripMargin
  val v2 = "As a user\nI want SSO login\nWith 2FA\nSo that access\nEnd"

  test("forward apply") {
    assert(DiffUtils.applyDiff(v1, diff) == v2)
  }

  test("reverse apply inverts") {
    assert(DiffUtils.applyDiff(v2, diff, reverse = true) == v1)
  }

  test("round trip arbitrary chain") {
    val d2 =
      """@@ -2,2 +2,1 @@
        |-I want SSO login
        |-With 2FA
        |+I want passkeys""".stripMargin
    val v3 = DiffUtils.applyDiff(v2, d2)
    assert(v3 == "As a user\nI want passkeys\nSo that access\nEnd")
    assert(DiffUtils.applyDiff(v3, d2, reverse = true) == v2)
  }

  test("empty text + pure insert diff") {
    val d = "@@ -0,0 +1,2 @@\n+line one\n+line two"
    assert(DiffUtils.applyDiff("", d) == "line one\nline two")
    assert(DiffUtils.applyDiff("line one\nline two", d, reverse = true) == "")
  }

  test("malformed diff throws (caller keeps prior text like the reference)") {
    intercept[IllegalArgumentException] {
      DiffUtils.applyDiff(v1, "not a diff")
    }
  }
}
