package graft.sources

import java.io.{File, FileInputStream}
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Self-signed TLS material for LOOPBACK `wss://` testing — the last
  * wire layer under the live feed (the reference connects
  * `wss://ws-subscriptions-clob.polymarket.com`,
  * `collector/src/client/connection.rs:80-135`; everything above TLS is
  * exercised byte-for-byte by [[WsChannel]]). No certificate or key is
  * embedded anywhere: [[genKeystore]] generates a FRESH RSA keypair per
  * run with the JDK's own `keytool` into a temp JKS, the server derives
  * its key managers from it, and the client trusts exactly that
  * keystore (pinned trust — the loopback stand-in for a real CA chain).
  * [[clientContext]] IS production-reachable: `FeedSource`'s
  * `tlsTruststore` option routes through it, so the loader accepts
  * both the JDK-default truststore format (PKCS12 since JDK 9) and
  * the JKS files [[genKeystore]] writes. [[genKeystore]] and
  * [[serverContext]] remain loopback-only.
  */
object TlsLoopback {

  /** Generate a fresh self-signed keypair in a temp JKS via the JDK's
    * keytool; returns (keystorePath, storePass). The file is
    * deleteOnExit-registered; the password is a throwaway local
    * constant (the keystore never leaves the temp dir or the run).
    */
  def genKeystore(): (String, String) = {
    val f = File.createTempFile("graft-wss-loopback", ".jks")
    f.delete() // keytool refuses to write into an existing empty file
    f.deleteOnExit()
    val pass = "loopback"
    val keytool = new File(new File(
      sys.props("java.home"), "bin"), "keytool").getAbsolutePath
    val cmd = Seq(keytool, "-genkeypair", "-alias", "loopback",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "7",
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1",
      "-keystore", f.getAbsolutePath, "-storetype", "JKS",
      "-storepass", pass, "-keypass", pass)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    require(code == 0 && f.exists(),
      s"keytool failed (exit $code): ${out.linesIterator.take(3).mkString(" | ")}")
    (f.getAbsolutePath, pass)
  }

  private def load(path: String, pass: String): KeyStore = {
    def attempt(storeType: String): KeyStore = {
      val ks = KeyStore.getInstance(storeType)
      val in = new FileInputStream(path)
      try ks.load(in, pass.toCharArray) finally in.close()
      ks
    }
    // JDK-default format first (PKCS12 since JDK 9) — a production
    // truststore handed to clientContext is most likely PKCS12 — then
    // JKS, the format genKeystore writes for the loopback pair.
    // KeyStore.load signals a format mismatch through several types
    // (IOException, NoSuchAlgorithmException, CertificateException),
    // so ANY non-fatal first failure falls through to the JKS attempt.
    // Keep the first attempt's exception attached (suppressed): a
    // WRONG PASSWORD also fails the first load, and reporting only the
    // JKS-format error would hide the real cause.
    try attempt(KeyStore.getDefaultType())
    catch {
      case scala.util.control.NonFatal(first) =>
        try attempt("JKS")
        catch {
          case scala.util.control.NonFatal(second) =>
            second.addSuppressed(first)
            throw second
        }
    }
  }

  /** Server side: an SSLContext keyed by the keystore's private key. */
  def serverContext(path: String, pass: String): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(load(path, pass), pass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client side: an SSLContext trusting exactly that keystore's cert
    * (pinned trust — a cert from anyone else fails the handshake).
    */
  def clientContext(path: String, pass: String): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(load(path, pass))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }
}
