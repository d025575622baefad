package graft

/** One-off probe: does the coded-residual fixture decode, and what do
  * the per-MB rows look like across seeds? */
object ScratchPresidProbe {
  def main(args: Array[String]): Unit = {
    import graft.pipeline.Multimodal
    var bad = 0
    (0L until 24L).foreach { id =>
      Multimodal.mpeg1IPDecode(Multimodal.mpeg1PResidualBytes(id)) match {
        case None => bad += 1; println(s"seed $id: FAILED to decode")
        case Some(((w, h), mbs)) =>
          if (id < 3) {
            println(s"seed $id dims ${w}x$h nRows=${mbs.size}")
            mbs.filter(_.pic == 1).foreach(r => println(
              f"  pic=${r.pic} mb=${r.mb} kind=${r.kind} dx=${r.dx}%3d " +
              f"dy=${r.dy}%3d cbp=${r.cbp}%2d ySum=${r.ySum}%6d ySq=${r.ySqSum}"))
          }
          val kinds = mbs.filter(_.pic == 1).map(_.kind)
          assert(kinds == Seq(0, 5, 6, 5, 2, 1, 6, 0),
            s"seed $id kinds $kinds")
      }
      Multimodal.mpeg1IPDecode(
          Multimodal.mpeg1PResidualBytes(id, withB = true)) match {
        case None => bad += 1; println(s"seed $id withB: FAILED")
        case Some((_, mbs)) =>
          val b = mbs.filter(_.pic == 2)
          if (id < 2) b.foreach(r => println(
            f"  B mb=${r.mb} kind=${r.kind} f=(${r.dx},${r.dy}) " +
            f"b=(${r.bdx},${r.bdy}) cbp=${r.cbp}%2d ySum=${r.ySum}"))
          val kinds = b.map(_.kind)
          assert(kinds == Seq(0, 5, 7, 0, 8, 2, 1, 0),
            s"seed $id B kinds $kinds")
      }
    }
    println(s"bad=$bad")
  }
}
