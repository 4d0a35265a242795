package graft.sources

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** Keystore-format coverage for [[TlsLoopback]]'s production-reachable
  * client path: `FeedSource`'s `tlsTruststore` option routes through
  * [[TlsLoopback.clientContext]], and the JDK's default keystore
  * format has been PKCS12 since JDK 9 — so a real deployment's
  * truststore is most likely PKCS12 while [[TlsLoopback.genKeystore]]
  * writes JKS. Both must load.
  */
class TlsLoopbackSpec extends AnyFunSuite {

  private def keytool: String = new File(new File(
    sys.props("java.home"), "bin"), "keytool").getAbsolutePath

  test("clientContext loads both JKS (loopback-generated) and PKCS12 " +
    "(JDK-default production truststore format)") {
    val (jksPath, pass) = TlsLoopback.genKeystore()
    // JKS — the format genKeystore writes
    assert(TlsLoopback.clientContext(jksPath, pass) != null)

    // PKCS12 — convert the same material with keytool
    val p12 = File.createTempFile("graft-wss-trust", ".p12")
    p12.delete()
    p12.deleteOnExit()
    val cmd = Seq(keytool, "-importkeystore",
      "-srckeystore", jksPath, "-srcstoretype", "JKS", "-srcstorepass", pass,
      "-destkeystore", p12.getAbsolutePath, "-deststoretype", "PKCS12",
      "-deststorepass", pass, "-destkeypass", pass, "-noprompt")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0 && p12.exists(),
      s"keytool -importkeystore failed: ${out.linesIterator.take(3).mkString(" | ")}")
    assert(TlsLoopback.clientContext(p12.getAbsolutePath, pass) != null)

    // and the server side still reads its own JKS
    assert(TlsLoopback.serverContext(jksPath, pass) != null)
  }
}
