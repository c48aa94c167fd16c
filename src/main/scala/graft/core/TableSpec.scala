package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-object schema + coercion spec (SURVEY.md §1.3).
  *
  * The reference hardcodes a keep-list and per-type-class cast loops in each
  * lambda (`lambda_litify_task.py:60-111`, `lambda_litify_matter.py:76-301`,
  * `lambda_litify_user.py:74-148`). We compile the same declaration to ONE
  * `select` of Catalyst expressions so the whole battery stays inside
  * whole-stage codegen — no per-column passes, no UDFs.
  *
  * Column names are matched case-insensitively against the input (the
  * reference lowercases post-hoc, `lambda_litify_task.py:113`); output names
  * are always lowercase.
  *
  * @param name       table name (e.g. "litify.task")
  * @param keys       merge key column(s), lowercase
  * @param ordering   keep-latest ordering column (e.g. "lastmodifieddate")
  * @param strings    string cols: NULL -> ''
  * @param timestamps timestamp cols: unparseable -> NULL
  * @param boolsTruthy    bool cols with truthiness coercion (task/user flavor)
  * @param boolsWhitelist bool cols with whitelist coercion (matter flavor)
  * @param ints       int cols: NULL -> 0
  * @param floats     float cols: NULL -> 0.0
  * @param datesDmy   dd/MM/yyyy date cols: invalid -> NULL
  * @param emptyAsNull cols where '' -> NULL + trim (sheets flavor)
  * @param residualStrings if true, any input column not named in a class is
  *        kept as a string (matter semantics, `lambda_litify_matter.py:279`);
  *        if false, unknown columns are dropped (task/user keep-list).
  */
final case class TableSpec(
    name: String,
    keys: Seq[String],
    ordering: String,
    strings: Seq[String] = Nil,
    timestamps: Seq[String] = Nil,
    boolsTruthy: Seq[String] = Nil,
    boolsWhitelist: Seq[String] = Nil,
    ints: Seq[String] = Nil,
    floats: Seq[String] = Nil,
    datesDmy: Seq[String] = Nil,
    emptyAsNull: Seq[String] = Nil,
    residualStrings: Boolean = false
) {
  import Coercions._

  /** All declared columns, lowercase, in declaration order. */
  def declared: Seq[String] =
    (strings ++ timestamps ++ boolsTruthy ++ boolsWhitelist ++ ints ++
      floats ++ datesDmy ++ emptyAsNull).map(_.toLowerCase)

  private def ruleFor(lc: String): Column => Column =
    if (strings.exists(_.toLowerCase == lc)) strFill
    else if (timestamps.exists(_.toLowerCase == lc)) tsCoerce
    else if (boolsTruthy.exists(_.toLowerCase == lc)) boolTruthy
    else if (boolsWhitelist.exists(_.toLowerCase == lc)) boolWhitelist
    else if (ints.exists(_.toLowerCase == lc)) intCoerce
    else if (floats.exists(_.toLowerCase == lc)) floatCoerce
    else if (datesDmy.exists(_.toLowerCase == lc)) dateDmy
    else if (emptyAsNull.exists(_.toLowerCase == lc)) Coercions.emptyAsNull
    else strFill

  /** Compile the spec against an input frame: project + cast + lowercase in a
    * single select (projection & casts fuse into the scan via Catalyst). */
  def apply(df: DataFrame): DataFrame = {
    val inputByLc = df.columns.map(c => c.toLowerCase -> c).toMap
    val kept: Seq[String] =
      if (residualStrings) {
        val extra = df.columns.map(_.toLowerCase).filterNot(declared.contains)
        declared.filter(inputByLc.contains) ++ extra
      } else declared.filter(inputByLc.contains)
    val cols = kept.map { lc =>
      ruleFor(lc)(col(inputByLc(lc))).as(lc)
    }
    df.select(cols: _*)
  }
}

/** Specs transcribed from the reference lambdas (FIXTURES.md §A). */
object TableSpecs {

  /** `litify.task` — 32 cols (`lambda_litify_task.py:60-111`). */
  val task: TableSpec = TableSpec(
    name = "litify.task",
    keys = Seq("id"),
    ordering = "lastmodifieddate",
    strings = Seq(
      "Id", "WhatId", "Subject", "Status", "Priority", "OwnerId",
      "Description", "CreatedById", "LastModifiedById", "TaskSubtype",
      "litify_pm__Default_Matter_Task__c", "litify_pm__Matter_Stage_Activity__c",
      "litify_pm__AssociatedObjectName__c", "litify_pm__AssigneeName__c",
      "litify_pm__MatterStage__c", "litify_pm__UserRoleRelatedJunction__c",
      "litify_ext__Status__c", "Completed_By__c"),
    timestamps = Seq(
      "ActivityDate", "Completed_Date__c", "In_Progress_Date__c",
      "CreatedDate", "LastModifiedDate", "CompletedDateTime",
      "litify_pm__Completed_Date__c", "SystemModstamp", "ReminderDateTime"),
    boolsTruthy = Seq(
      "IsHighPriority", "IsClosed", "IsReminderSet", "IsRecurrence",
      "Show_On_Calendar__c")
  )

  /** `litify.dim_users` — 40 cols (`lambda_litify_user.py:74-148`). */
  val user: TableSpec = TableSpec(
    name = "litify.dim_users",
    keys = Seq("id"),
    ordering = "lastmodifieddate",
    boolsTruthy = Seq("isactive", "receivesinfoemails",
      "receivesadmininfoemails", "dfsle__canmanageaccount__c"),
    timestamps = Seq("lastvieweddate", "lastreferenceddate", "lastlogindate",
      "lastmodifieddate", "createddate", "lastpasswordchangedate",
      "systemmodstamp", "passwordexpirationdate", "dfsle__provisioned__c"),
    floats = Seq("startday", "endday", "numberoffailedlogins"),
    strings = Seq("id", "username", "lastname", "firstname", "name",
      "companyname", "division", "department", "title", "street", "city",
      "state", "postalcode", "country", "email", "phone", "mobilephone",
      "alias", "communitynickname", "timezonesidkey", "localesidkey",
      "emailencodingkey", "profileid", "languagelocalekey")
  )

  /** `litify.matter` — representative subset of the ~250-col spec
    * (`lambda_litify_matter.py:76-279`); residual columns default to string
    * exactly like the reference's fallthrough at `:279`. */
  val matter: TableSpec = TableSpec(
    name = "litify.matter",
    keys = Seq("id"),
    ordering = "lastmodifieddate",
    timestamps = Seq("createddate", "lastmodifieddate", "systemmodstamp",
      "litify_pm__open_date__c", "litify_pm__closed_date__c",
      "rfe_deadline__c", "filing_deadline__c"),
    boolsWhitelist = Seq("isdeleted", "urgent__c", "pro_bono__c",
      "litify_pm__billable_matter__c"),
    ints = Seq("live_saved__c", "lives_saved__c", "no_of_days__c",
      "turnaround_time__c", "count_role_records__c", "case_count__c",
      "live_associated__c", "litify_pm__matter__c",
      "litify_pm__total_calls__c", "successful_calls__c",
      "litify_pm__total_emails__c"),
    floats = Seq("litify_pm__total_damages__c", "scheduled_amount__c",
      "total_expenses__c", "litify_pm__amount_due__c",
      "litify_pm__total_amount_billed__c"),
    residualStrings = true
  )

  /** `legal.employee` (`lambda_legal_employee_upsert.py:95-133`). */
  val employee: TableSpec = TableSpec(
    name = "legal.employee",
    keys = Seq("email"),
    ordering = "lastmodifieddate",
    emptyAsNull = Seq("email", "name", "position", "tower", "team",
      "supervisor", "manager", "country", "phone", "work_phone",
      "schedule_daylight", "schedule_standard"),
    datesDmy = Seq("hire", "fire", "birth"),
    timestamps = Seq("lastmodifieddate")
  )
}
