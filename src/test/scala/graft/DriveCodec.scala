package graft

import graft.codec._

/** Manual verification driver (not a test): exercises the public codec API
  * the way a library consumer would. Run: sbt "Test/runMain graft.DriveCodec" */
object DriveCodec {
  def main(args: Array[String]): Unit = {
    val v = Array.tabulate(10000)(i => if (i % 100 < 90) 7 else i % 512)
    val enc = TokenCodec.encodeAuto(v)
    println(s"DRIVE1 codec=${CodecId.name(enc(2))} raw=${4 * v.length} enc=${enc.length} ratio=${enc.length.toDouble / (4 * v.length)}")
    val back = TokenCodec.decodeOrThrow(enc)
    println(s"DRIVE2 roundtrip=${back.sameElements(v)}")
    val bad = enc.clone; bad(20) = (bad(20) ^ 0xff).toByte
    println(s"DRIVE3 corrupt->${TokenCodec.decode(bad)}")
    println(s"DRIVE4 truncated->${TokenCodec.decode(java.util.Arrays.copyOf(enc, 9))}")
    println(s"DRIVE5 garbage->${TokenCodec.decode(Array[Byte](1,2,3,4,5,6,7,8,9,10,11,12))}")
    val ids = (0 until 500).map(i => f"doc-$i%012d").mkString.getBytes
    val fe = Fsst.encode(ids)
    println(s"DRIVE6 fsst raw=${ids.length} enc=${fe.length} roundtrip=${Fsst.decode(fe).sameElements(ids)}")
  }
}
