package graft

import graft.core.TableSpecs

/** §1.3 schema-system semantics over reference-shaped fixtures. */
class TableSpecSpec extends SparkSpec {
  import spark.implicits._

  test("task spec: keep-list projection, lowercase, per-class coercion") {
    val raw = Seq(
      ("1", "2024-01-05T10:00:00", "false", "Call client", "junk1"),
      ("2", "garbage-ts", "", "Review", "junk2"),
      ("3", null, "t", null, "junk3"))
      .toDF("Id", "LastModifiedDate", "IsClosed", "Subject", "UnknownCol")
    val out = TableSpecs.task(raw)
    // unknown column dropped, names lowercased
    assert(!out.columns.contains("unknowncol"))
    assert(out.columns.toSet == Set("id", "lastmodifieddate", "isclosed", "subject"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[Int]("isclosed") == 1)      // "false" -> 1 (truthiness)
    assert(rows(1).getAs[Int]("isclosed") == 0)      // "" -> 0
    assert(rows(1).getAs[Any]("lastmodifieddate") == null) // coerce failure
    assert(rows(2).getAs[String]("subject") == "")   // NULL -> ''
  }

  test("matter spec: residual columns default to string") {
    val raw = Seq(("1", "2024-01-05 00:00:00", "TRUE", "7", "something"))
      .toDF("Id", "LastModifiedDate", "Urgent__c", "Case_Count__c", "Custom_Extra__c")
    val out = TableSpecs.matter(raw)
    assert(out.columns.contains("custom_extra__c")) // residual kept as string
    val r = out.collect()(0)
    assert(r.getAs[Int]("urgent__c") == 0)          // whitelist: "TRUE" -> 0
    assert(r.getAs[Long]("case_count__c") == 7L)
    assert(r.getAs[String]("custom_extra__c") == "something")
  }

  test("matter spec: full type-class transcription (74/63/11/38)") {
    val m = TableSpecs.matter
    assert(m.timestamps.size == 74)
    assert(m.boolsWhitelist.size == 63)
    assert(m.ints.size == 11)
    assert(m.floats.size == 38)
    assert(m.declared.size == 74 + 63 + 11 + 38)
    assert(m.declared.distinct.size == m.declared.size) // no dup classing
    // spot checks across the lists (lambda_litify_matter.py:76-279)
    assert(m.timestamps.contains("dec_forms_sent_for_review__c"))
    assert(m.boolsWhitelist.contains("money_back_guarantee__c"))
    assert(m.ints.contains("litify_pm__total_emails__c"))
    assert(m.floats.contains("urgentoverdue__c"))
  }

  test("f_calls spec: nullable longs stay null (tuple-insert pipeline)") {
    val raw = Seq(("c1", "2024-01-01 10:00:00", null.asInstanceOf[String], "120"))
      .toDF("contact_id", "init_time", "agent_holds", "contact_duration")
    val r = TableSpecs.fCalls(raw).collect()(0)
    assert(r.getAs[String]("contact_id") == "c1")
    assert(r.getAs[Any]("agent_holds") == null)         // no fillna(0)
    assert(r.getAs[Long]("contact_duration") == 120L)
    assert(TableSpecs.fCalls.declared.size == 31)
  }

  test("agent_metrics spec: 52 metric doubles, None -> NULL") {
    val am = TableSpecs.agentMetrics
    assert(am.doubles.size == 52)
    assert(am.declared.size == 3 + 52)
    val raw = Seq(("a1", "2024-01-01 10:00:00", "0.13", null.asInstanceOf[String]))
      .toDF("agent_id", "start_time", "agent_occupancy", "avg_holds")
    val r = am(raw).collect()(0)
    assert(r.getAs[Double]("agent_occupancy") == 0.13)
    assert(r.getAs[Any]("avg_holds") == null)
  }

  test("goals / connect dim specs declared") {
    assert(TableSpecs.goals.keys == Seq("employee_email", "week_first_day"))
    assert(TableSpecs.dimUsersConnect.declared.size == 5)
    assert(TableSpecs.dimQueues.declared.size == 3)
  }

  test("employee spec: sheets semantics — blanks null, dd/MM/yyyy dates") {
    val raw = Seq(("  a@b.c ", "", "31/02/2024", "15/03/2021", "2024-05-01 00:00:00"))
      .toDF("email", "team", "birth", "hire", "lastmodifieddate")
    val r = TableSpecs.employee(raw).collect()(0)
    assert(r.getAs[String]("email") == "a@b.c")     // trimmed
    assert(r.getAs[String]("team") == null)         // blank -> NULL
    assert(r.getAs[Any]("birth") == null)           // invalid date -> NULL
    assert(r.getAs[java.sql.Date]("hire").toString == "2021-03-15")
  }
}
