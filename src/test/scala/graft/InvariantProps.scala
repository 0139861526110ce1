package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.CdcStream.{Change, KeyState}

/** ScalaCheck properties for the engine's pure core invariants:
  * last-writer-wins is an associative/commutative fold (so the batch
  * argmax, the streaming incremental fold, and any partial-aggregation
  * split agree), Jaccard bounds, and partition-plan coverage.
  */
object InvariantProps extends Properties("graft.invariants") {

  private val genChange: Gen[Change] = for {
    uid <- Gen.choose(0L, 5L)
    eid <- Gen.choose(0L, 1000L)
    ems <- Gen.choose(0L, 50L) // small range forces ems ties
    op <- Gen.oneOf("I", "U", "D")
    cents <- Gen.choose(-10000L, 10000L)
  } yield Change(uid, eid, ems, op, cents)

  /** Changelog lists with the event_id uniqueness invariant the real log
    * carries (event_id is a unique sequence number). ems ties stay frequent —
    * that's the tie-break under test — but a duplicated (ems, event_id) pair
    * is unrepresentable upstream, and without uniqueness LWW is genuinely
    * order-dependent for any engine.
    */
  private val genChanges: Gen[List[Change]] =
    Gen.listOf(genChange).map(_.zipWithIndex.map { case (c, i) =>
      c.copy(event_id = c.event_id * 2048 + i)
    })

  private def later(a: Change, b: Change): Change =
    if (b.ems > a.ems || (b.ems == a.ems && b.event_id > a.event_id)) b else a

  /** Reference result: strict replay in (ems, event_id) order. */
  private def replay(changes: List[Change]): Map[Long, Change] =
    changes.sortBy(c => (c.ems, c.event_id))
      .foldLeft(Map.empty[Long, Change])((m, c) => m.updated(c.user_id, c))

  property("LWW fold order-independence (batch argmax == ordered replay)") =
    forAll(genChanges) { changes =>
      val folded = changes.groupBy(_.user_id)
        .map { case (k, cs) => k -> cs.reduce(later) }
      folded == replay(changes)
    }

  property("LWW partial aggregation: any split merges to the same state") =
    forAll(genChanges, Gen.choose(0, 100)) { (changes, cut) =>
      val (a, b) = changes.splitAt(cut % (changes.length + 1))
      def fold(cs: List[Change]) =
        cs.groupBy(_.user_id).map { case (k, v) => k -> v.reduce(later) }
      val merged = (fold(a).toSeq ++ fold(b).toSeq)
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).reduce(later) }
      merged == fold(changes)
    }

  property("streaming KeyState fold equals batch fold") =
    forAll(genChanges) { changes =>
      // micro-batch the stream arbitrarily (size 3) and fold like
      // CdcStream.latestState does
      val streamed = changes.grouped(3).foldLeft(Map.empty[Long, KeyState]) {
        (state, batch) =>
          batch.groupBy(_.user_id).foldLeft(state) { case (st, (uid, cs)) =>
            val c = cs.reduce(later)
            st.get(uid) match {
              case Some(s) if !(c.ems > s.last_ems ||
                (c.ems == s.last_ems && c.event_id > s.last_event_id)) => st
              case _ => st.updated(uid,
                KeyState(uid, c.event_id, c.ems, c.op, c.value_cents))
            }
          }
      }
      val batchRes = replay(changes).map { case (k, c) =>
        k -> KeyState(k, c.event_id, c.ems, c.op, c.value_cents)
      }
      streamed == batchRes
    }

  private val genSet = Gen.containerOf[Set, Long](Gen.choose(0L, 50L))

  property("Jaccard milli is within [0, 1000] and 1000 iff equal (nonempty)") =
    forAll(genSet, genSet) { (a, b) =>
      if (a.isEmpty && b.isEmpty) true
      else {
        val inter = a.intersect(b).size.toLong
        val uni = (a.size + b.size - inter).toLong
        val jm = inter * 1000 / uni
        jm >= 0 && jm <= 1000 && ((jm == 1000) == (a == b))
      }
    }

  property("portable hash: md5Long in [0, 2^60), permutations in [0, P), " +
    "band keys in [0, Q) — no ANSI overflow anywhere") =
    forAll(Gen.asciiPrintableStr, Gen.choose(0, 63)) { (s, seed) =>
      import graft.functions.PortableHash._
      val h = md5Long(s)
      val p = ((h % P) * A(seed) + B(seed)) % P
      val k = Seq(p, p, p, p).tail.foldLeft(p % BandQ)((acc, m) =>
        (acc * BandR + m) % BandQ)
      h >= 0 && h < (1L << 60) && p >= 0 && p < P && k >= 0 && k < BandQ &&
        A(seed) >= 1 && A(seed) <= (1L << 30) &&
        // every intermediate of the permutation stays inside a long
        (h % P) <= (Long.MaxValue - B(seed)) / A(seed)
    }

  property("poll backoff: monotone nonincreasing in polled, bounded, " +
    "exact at the endpoints") =
    forAll(Gen.choose(0L, 2000L), Gen.choose(1L, 1000L),
      Gen.choose(0L, 100000L)) { (polled, batch, wait) =>
      import graft.streaming.CdcStream.backoffMs
      val w = backoffMs(polled, batch, wait)
      w >= 0 && w <= wait &&
        backoffMs(0, batch, wait) == wait &&
        backoffMs(batch, batch, wait) == 0 &&
        (polled == 0 || backoffMs(polled - 1, batch, wait) >= w)
    }

  property("trigger specs: one row per (sync, op); mysql rows carry no " +
    "function; reconciliation inputs are deterministic") =
    forAll(Gen.const(())) { _ =>
      import graft.config.SyncConfigs
      val rows = SyncConfigs.triggerSpecRows()
      val cfg = SyncConfigs.parse(SyncConfigs.DemoYaml)
      rows.length == cfg.sync.length * 3 &&
        rows.forall(r => (r._2 == "mysql") == r._7.isEmpty) &&
        SyncConfigs.desiredCatalogRows() == SyncConfigs.desiredCatalogRows() &&
        SyncConfigs.existingCatalogRows() == SyncConfigs.existingCatalogRows()
    }

  property("hash sampling/splitting: bucket ranges, total split coverage, " +
    "and determinism") =
    forAll(Gen.choose(0L, 1000000L)) { docId =>
      import graft.functions.PortableHash.md5Long
      val sampleBucket = md5Long(s"sample:$docId") % 1000
      val splitBucket = md5Long(s"split:$docId") % 100
      val split =
        if (splitBucket < 98) "train" else if (splitBucket < 99) "val" else "test"
      sampleBucket >= 0 && sampleBucket < 1000 &&
        splitBucket >= 0 && splitBucket < 100 &&
        Set("train", "val", "test")(split) &&
        // re-derivation is stable (pure function of the id)
        md5Long(s"split:$docId") == md5Long(s"split:$docId")
    }

  property("portable hash permutations stay in [0, P) with no long overflow") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(0, 63)) { (h, seed) =>
      import graft.functions.PortableHash.{A, B, P}
      val hm = (h % P + P) % P
      // the Column tree computes hm * A(seed) + B(seed): prove the
      // intermediate fits a signed long for ANY reduced input
      val prod = BigInt(hm) * A(seed) + B(seed)
      val perm = (hm * A(seed) + B(seed)) % P
      prod <= BigInt(Long.MaxValue) && perm >= 0 && perm < P
    }

  property("band key fold stays in [0, BandQ) for any in-range minhashes") =
    forAll(Gen.listOfN(4, Gen.choose(0L, graft.functions.PortableHash.P - 1))) {
      ms =>
        import graft.functions.PortableHash.{BandQ, BandR}
        val k = ms.tail.foldLeft(ms.head % BandQ)((acc, m) =>
          (acc * BandR + m) % BandQ)
        val maxInter = BigInt(BandQ - 1) * BandR +
          (graft.functions.PortableHash.P - 1)
        k >= 0 && k < BandQ && maxInter <= BigInt(Long.MaxValue)
    }

  // --- sketch invariants: pure-Scala mirrors of the exact arithmetic
  // the Sketches Column trees embed (same md5 base hash, same A/B
  // permutation constants), so these prove the algorithm, not a copy

  private def sketchPositions(key: String, n: Int, mod: Long): Seq[Long] = {
    import graft.functions.PortableHash.{md5Long, A, B, P}
    val hm = md5Long(key) % P
    (0 until n).map(s => (hm * A(s) + B(s)) % P % mod)
  }

  property("bloom filter has NO false negatives for any key set") =
    forAll(Gen.listOf(Gen.choose(0L, 100000L)),
      Gen.listOf(Gen.choose(0L, 100000L))) { (members, probes) =>
      import graft.operators.Sketches.{BloomBits, BloomHashes, WordBits}
      val words = members
        .flatMap(k => sketchPositions(k.toString, BloomHashes, BloomBits))
        .groupBy(_ / WordBits)
        .map { case (w, ps) =>
          w -> ps.map(p => 1L << (p % WordBits).toInt).reduce(_ | _)
        }
      def maybe(k: Long): Boolean =
        sketchPositions(k.toString, BloomHashes, BloomBits).forall { p =>
          val mask = 1L << (p % WordBits).toInt
          (words.getOrElse(p / WordBits, 0L) & mask) == mask
        }
      // every member tests positive; every mask is a positive long
      members.forall(maybe) &&
        words.values.forall(_ > 0L || words.isEmpty)
    }

  property("count-min estimate never undercounts any token") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee", "f0", "g"))) {
      toks =>
        import graft.operators.Sketches.{CmsDepth, CmsWidth}
        val cells = toks
          .flatMap(t => sketchPositions(t, CmsDepth, CmsWidth).zipWithIndex)
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val exact = toks.groupBy(identity).map { case (t, v) => t -> v.size }
        exact.forall { case (t, n) =>
          val est = sketchPositions(t, CmsDepth, CmsWidth).zipWithIndex
            .map(cells(_)).min
          est >= n
        }
    }

  property("partition plan covers [lo, hi] exactly, ranges disjoint & adjacent") =
    forAll(Gen.choose(0L, 1000L), Gen.choose(1L, 100000L)) { (lo, span) =>
      val hi = lo + span
      val n = 8
      val stride = (hi - lo) / n
      val ranges = (0L until n).map { pid =>
        val rlo = lo + pid * stride
        val rhi = if (pid == n - 1) hi + 1 else lo + (pid + 1) * stride
        (rlo, rhi)
      }
      val structural = ranges.head._1 == lo && ranges.last._2 == hi + 1 &&
        ranges.sliding(2).forall { case Seq(x, y) => x._2 == y._1 }
      // exhaustive membership check only for small spans
      val membership = span > 5000 ||
        (lo to hi).forall(v => ranges.count(r => v >= r._1 && v < r._2) == 1)
      structural && membership
    }

  /** Independent per-EVENT reference for the U-shape credit split:
    * roles and credits assigned positionally (the batch window form's
    * shape), rolled up per (type, role) — must equal the census-based
    * journey-state computation the stream uses, for ANY touch
    * sequence including negative (refund-style) purchase values. */
  private def refPosCredits(touches: List[String], valueCents: Long)
  : Map[(String, String), (Long, Long)] = {
    import graft.operators.Analytics.{PosDen, PosEndNum}
    val m = valueCents * 1000L
    val n = touches.length.toLong
    val rows: List[(String, String, Long)] =
      if (n == 0) List(("none", "none", m))
      else touches.zipWithIndex.map { case (t, i) =>
        val role =
          if (n == 1) "solo"
          else if (i == 0) "first"
          else if (i == n - 1) "last"
          else "mid"
        val credit = role match {
          case "solo" => m
          case "mid"  => m / PosDen / (n - 2)
          case _      => if (n == 2) m / 2 else m * PosEndNum / PosDen
        }
        (t, role, credit)
      }
    rows.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> (rs.length.toLong, rs.map(_._3).sum) }
  }

  private val genTouches: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("click", "view", "signup"))

  property("U-shape credits: journey-census state == positional reference") =
    forAll(genTouches, Gen.choose(-10000L, 10000L)) { (touches, v) =>
      val census = scala.collection.mutable.LinkedHashMap[String, Long]()
      touches.foreach(t => census(t) = census.getOrElse(t, 0L) + 1L)
      val got = graft.streaming.CdcStream
        .posCredits(touches.headOption.getOrElse(""),
          touches.lastOption.getOrElse(""), census.toSeq, v)
        .groupBy(c => (c.touch_type, c.role))
        .map { case (k, cs) =>
          k -> (cs.map(_.n_rows).sum, cs.map(_.credit_milli).sum) }
      got == refPosCredits(touches, v)
    }

  property("U-shape credits: conservation up to bounded truncation loss") =
    forAll(genTouches, Gen.choose(0L, 10000L)) { (touches, v) =>
      val census = scala.collection.mutable.LinkedHashMap[String, Long]()
      touches.foreach(t => census(t) = census.getOrElse(t, 0L) + 1L)
      val m = v * 1000L
      val total = graft.streaming.CdcStream
        .posCredits(touches.headOption.getOrElse(""),
          touches.lastOption.getOrElse(""), census.toSeq, v)
        .map(_.credit_milli).sum
      val lossBound = graft.operators.Analytics.PosDen +
        touches.length.toLong
      total <= m && m - total <= lossBound
    }
}
