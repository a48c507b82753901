package graft.tools

/** Round-6 `parsed:null` diagnostic: determines exactly which output
  * channels escape sbt's in-process log decoration (the driver's tail
  * capture has seen only `[info] `-prefixed JSON for 5 rounds). Prints
  * one marker line per channel; run under `sbt -batch 'runMain
  * graft.tools.RawProbe' > out.txt` and inspect which markers arrive
  * bare. Findings feed Bench.emitFinal.
  */
object RawProbe {
  def main(args: Array[String]): Unit = {
    println("VIA_PRINTLN")
    System.out.println("VIA_SYSTEM_OUT")
    System.err.println("VIA_SYSTEM_ERR")
    val raw = new java.io.FileOutputStream(java.io.FileDescriptor.out)
    raw.write("VIA_RAWFD\n".getBytes("UTF-8"))
    raw.flush()
    val rawErr = new java.io.FileOutputStream(java.io.FileDescriptor.err)
    rawErr.write("VIA_RAWFD_ERR\n".getBytes("UTF-8"))
    rawErr.flush()
  }
}
