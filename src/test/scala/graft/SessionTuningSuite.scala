package graft

/** Pins SessionTuning.boundedPlan's conf contract: the AQE-off child
  * is cached per parent, yet RUNTIME `graft.*` knob changes on the
  * parent reach it on every lookup (set, changed, AND unset) — the
  * r14 staleness fix, so knob A/Bs measure what they claim — while
  * Spark's own confs keep creation-time snapshot semantics (the child
  * exists precisely to hold AQE off).
  */
class SessionTuningSuite extends SparkSuite {

  test("boundedPlan child sees runtime graft.* knob set/change/unset") {
    val knob = "graft.testKnob"
    spark.conf.unset(knob)
    try {
      val child0 = graft.core.SessionTuning.boundedPlan(spark)
      assert(child0.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(child0.conf.getOption(knob).isEmpty)

      spark.conf.set(knob, "on")
      val child1 = graft.core.SessionTuning.boundedPlan(spark)
      assert(child1 eq child0, "child session must be cached per parent")
      assert(child1.conf.getOption(knob).contains("on"))

      spark.conf.set(knob, "off")
      assert(graft.core.SessionTuning.boundedPlan(spark)
        .conf.getOption(knob).contains("off"))

      spark.conf.unset(knob)
      assert(graft.core.SessionTuning.boundedPlan(spark)
        .conf.getOption(knob).isEmpty,
        "an unset parent knob must unset in the child too")

      // Spark's own conf keeps snapshot semantics: AQE stays off in
      // the child no matter the parent's runtime value
      assert(graft.core.SessionTuning.boundedPlan(spark)
        .conf.get("spark.sql.adaptive.enabled") == "false")
    } finally spark.conf.unset(knob)
  }
}
