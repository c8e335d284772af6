package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeyCryptoSpec extends SparkSpec {

  private def newStore(): (String, String) =
    (s"${tmpDir("ks")}/creds.jceks", "hunter2-keystore-pw")

  test("JCEKS store: generate, persist, reload; ids increment") {
    val (path, pw) = newStore()
    assert(JceksCredentialStore.generateKey(path, pw) == 1)
    assert(JceksCredentialStore.generateKey(path, pw) == 2)
    val ring = JceksCredentialStore.loadRing(path, pw)
    assert(ring.keys.keySet == Set(1, 2) && ring.newestId == 2)
    assert(ring.keys(1).length == KeyCrypto.AesKeyBytes)
    assert(!ring.keys(1).sameElements(ring.keys(2)))
    // wrong password must not silently yield an empty/garbage ring
    intercept[java.io.IOException] {
      JceksCredentialStore.load(path, "wrong-password")
    }
    intercept[IllegalArgumentException] {
      JceksCredentialStore.load(s"$path-nope", pw)
    }
  }

  test("rotating encrypt/decrypt round-trips; old-key data stays readable") {
    import spark.implicits._
    val (path, pw) = newStore()
    JceksCredentialStore.generateKey(path, pw)
    val ringV1 = JceksCredentialStore.loadRing(path, pw)
    val df = Seq("alpha", "beta", "").toDF("s")
      .withColumn("ct", KeyCrypto.aesEncryptRotating($"s".cast("binary"), ringV1))
    val encrypted = df.select($"s", $"ct").collect()
    // rotate: key 2 becomes newest; key-1 ciphertext must still decrypt
    JceksCredentialStore.generateKey(path, pw)
    val ringV2 = JceksCredentialStore.loadRing(path, pw)
    assert(ringV2.newestId == 2)
    val back = spark.createDataFrame(
      spark.sparkContext.parallelize(encrypted.toIndexedSeq), df.schema)
      .withColumn("pt", KeyCrypto.aesDecryptRotating($"ct", ringV2).cast("string"))
    assert(back.filter($"pt" === $"s").count() == 3)
    // new writes under ring v2 carry keyId 2 in the header
    val ct2 = Seq("x").toDF("s")
      .select(KeyCrypto.aesEncryptRotating($"s".cast("binary"), ringV2))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.nio.ByteBuffer.wrap(ct2).getInt == 2)
  }

  test("two encryptions of one plaintext differ (fresh IV, no CSE merge)") {
    import spark.implicits._
    val (path, pw) = newStore()
    JceksCredentialStore.generateKey(path, pw)
    val ring = JceksCredentialStore.loadRing(path, pw)
    val row = Seq("same-plaintext").toDF("s")
      .withColumn("a", KeyCrypto.aesEncryptRotating($"s".cast("binary"), ring))
      .withColumn("b", KeyCrypto.aesEncryptRotating($"s".cast("binary"), ring))
      .select($"a", $"b").collect()(0)
    assert(!row.getAs[Array[Byte]](0).sameElements(row.getAs[Array[Byte]](1)))
  }

  test("string-field converter faces round-trip through base64 strings") {
    import spark.implicits._
    val (path, pw) = newStore()
    JceksCredentialStore.generateKey(path, pw)
    val ring = JceksCredentialStore.loadRing(path, pw)
    val out = Seq(("k1", "s3cret"), ("k2", "päyload")).toDF("k", "v")
      .withColumn("enc", KeyCrypto.encryptStringField($"v", ring))
      .withColumn("dec", KeyCrypto.decryptStringField($"enc", ring))
    assert(out.filter($"dec" === $"v").count() == 2)
    // the encrypted column is printable base64, not raw bytes
    assert(out.filter($"enc".rlike("^[A-Za-z0-9+/=]+$")).count() == 2)
  }

  test("decrypting with a ring missing the writing key fails loudly") {
    import spark.implicits._
    val (path, pw) = newStore()
    JceksCredentialStore.generateKey(path, pw)
    val ring1 = JceksCredentialStore.loadRing(path, pw)
    val ct = Seq("x").toDF("s")
      .select(KeyCrypto.aesEncryptRotating($"s".cast("binary"), ring1).as("ct"))
      .collect()(0).getAs[Array[Byte]](0)
    // a DIFFERENT store whose only key has id 7: id 1 is unknown to it
    val (path2, pw2) = newStore()
    (1 to 7).foreach(_ => JceksCredentialStore.generateKey(path2, pw2))
    val ring2 = KeyCrypto.KeyRing(
      JceksCredentialStore.loadRing(path2, pw2).keys.filter(_._1 == 7))
    // local[n] surfaces the eval exception directly; a cluster wraps it
    // in SparkException — accept either, but the message must name the key
    val e = intercept[Exception] {
      spark.createDataset(Seq(ct)).toDF("ct")
        .select(KeyCrypto.aesDecryptRotating($"ct", ring2)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("not in the credential store")), s"got $msgs")
  }

  test("a tampered ciphertext FAILS decryption (GCM tag), never silently corrupts") {
    import spark.implicits._
    val (path, pw) = newStore()
    JceksCredentialStore.generateKey(path, pw)
    val ring = JceksCredentialStore.loadRing(path, pw)
    val ct = Seq("payload-to-protect").toDF("s")
      .select(KeyCrypto.aesEncryptRotating($"s".cast("binary"), ring).as("ct"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.nio.ByteBuffer.wrap(ct).getInt(4) == KeyCrypto.GcmIvBytes,
      "header must carry the 12-byte GCM iv length")
    val tampered = ct.clone()
    tampered(tampered.length - 20) = (tampered(tampered.length - 20) ^ 0x01).toByte
    val e = intercept[Exception] {
      spark.createDataset(Seq(tampered)).toDF("ct")
        .select(KeyCrypto.aesDecryptRotating($"ct", ring)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => t.getClass.getName + ": " + String.valueOf(t.getMessage)).toSeq
    assert(msgs.exists(m => m.contains("AEADBadTagException") ||
      m.toLowerCase.contains("tag mismatch")), s"got $msgs")
  }

  test("legacy 16-byte-IV CBC ciphertexts (the reference's codec) still decrypt") {
    import spark.implicits._
    val (path, pw) = newStore()
    JceksCredentialStore.generateKey(path, pw)
    val ring = JceksCredentialStore.loadRing(path, pw)
    // hand-build a CBC row in the self-describing layout
    val iv = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ring.keys(1), "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val body = cipher.doFinal("legacy row".getBytes("UTF-8"))
    val buf = java.nio.ByteBuffer.allocate(8 + iv.length + body.length)
    buf.putInt(1).putInt(iv.length).put(iv).put(body)
    val got = spark.createDataset(Seq(buf.array())).toDF("ct")
      .select(KeyCrypto.aesDecryptRotating($"ct", ring).cast("string"))
      .collect()(0).getString(0)
    assert(got == "legacy row")
  }

  test("JSON credential store parses hex and base64 rings") {
    val dir = tmpDir("jsoncreds")
    val keyHex = "000102030405060708090a0b0c0d0e0f"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/hex.json"), s"""{"1":"$keyHex"}""")
    val hexRing = JsonCredentialStore.loadRing(s"$dir/hex.json")
    assert(hexRing.keys(1).toSeq == (0 until 16).map(_.toByte).toSeq)
    val b64 = java.util.Base64.getEncoder.encodeToString(
      (0 until 16).map(_.toByte).toArray)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/b64.json"), s"""{"3":"$b64"}""")
    val b64Ring = JsonCredentialStore.loadRing(s"$dir/b64.json",
      JsonCredentialStore.B64)
    assert(b64Ring.keys(3).toSeq == hexRing.keys(1).toSeq)
  }
}
