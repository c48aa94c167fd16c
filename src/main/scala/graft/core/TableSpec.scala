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
  * @param longs      nullable long cols (tuple-insert pipelines: no fillna,
  *                   Redshift DDL types them — f_calls durations)
  * @param doubles    nullable double cols (metrics API values, None -> NULL)
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
    longs: Seq[String] = Nil,
    doubles: Seq[String] = Nil,
    datesDmy: Seq[String] = Nil,
    emptyAsNull: Seq[String] = Nil,
    residualStrings: Boolean = false
) {
  import Coercions._

  /** All declared columns, lowercase, in declaration order. */
  def declared: Seq[String] =
    (strings ++ timestamps ++ boolsTruthy ++ boolsWhitelist ++ ints ++
      floats ++ longs ++ doubles ++ datesDmy ++ emptyAsNull).map(_.toLowerCase)

  private def ruleFor(lc: String): Column => Column =
    if (strings.exists(_.toLowerCase == lc)) strFill
    else if (timestamps.exists(_.toLowerCase == lc)) tsCoerce
    else if (boolsTruthy.exists(_.toLowerCase == lc)) boolTruthy
    else if (boolsWhitelist.exists(_.toLowerCase == lc)) boolWhitelist
    else if (ints.exists(_.toLowerCase == lc)) intCoerce
    else if (floats.exists(_.toLowerCase == lc)) floatCoerce
    else if (longs.exists(_.toLowerCase == lc)) (c => c.cast("long"))
    else if (doubles.exists(_.toLowerCase == lc)) (c => c.cast("double"))
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

  /** `litify.matter` — the reference's largest artifact: the FULL four
    * type-class lists (74 timestamps, 63 whitelist-bools, 11 ints,
    * 38 floats) transcribed from `lambda_litify_matter.py:74-279`;
    * every other input column defaults to string exactly like the
    * reference's fallthrough at `:279` (residualStrings). */
  val matter: TableSpec = TableSpec(
    name = "litify.matter",
    keys = Seq("id"),
    ordering = "lastmodifieddate",
    timestamps = Seq(
      "createddate", "lastmodifieddate", "systemmodstamp", "lastactivitydate",
      "litify_pm__open_date__c", "litify_pm__last_called_at__c",
      "litify_pm__last_emailed_at__c", "litify_pm__closed_date__c",
      "litify_pm__filed_date__c", "rfe_deadline__c",
      "emergency_deadline_date__c", "approved_denied_date__c",
      "psych_eval_date__c", "submitted_to_uscis__c", "reviewed_with_cl__c",
      "ff_paid_on__c", "receipt_notices_received__c",
      "fingerprint_appointment__c", "psych_eval_completed__c",
      "psych_eval_submitted_to_uscis__c", "rfe_received__c",
      "rfe_submission__c", "received_prima_facie__c",
      "received_work_permit__c", "checkboxf__c", "foia_request__c",
      "fbi_submission__c", "appeal_deadline__c", "approval_received__c",
      "denial_received__c", "client_notified__c",
      "uscis_receipt_cl_notified__c", "fingerprint_cl_notified__c",
      "rfe_received_cl_notified__c", "work_permit_cl_notified__c",
      "approval_received_cl_notified__c", "denial_received_cl_notified__c",
      "received_work_permit2__c", "work_permit_cl_notified2__c",
      "docs_collected__c", "accurint_report_completed__c", "sign_up_day__c",
      "cl_interview__c", "delivered_on__c", "intreview_completed__c",
      "forms_completed__c", "rejection_received__c", "refiling_date__c",
      "prima_facie_cl_notified__c", "early_aos_requested__c",
      "early_aos_requested_cl_notified__c",
      "early_aos_approved_cl_notified__c", "aos_approval_received__c",
      "referred_out_for_pe__c", "latest_case_update__c", "rfe_delivery__c",
      "qc_completed__c", "follow_up_date__c", "date_ff_paid_on__c",
      "noid_received__c", "noid_responded__c", "pre_rfe_date__c",
      "latest_docs_fu__c", "i_485_interview_360__c", "i_485_interview_aos__c",
      "asc_appointment_date__c", "welcome_email_sent__c",
      "last_auto_txt_communication__c", "pif2__c", "bonafide_received__c",
      "status_changed_date_time__c", "concern_raised__c",
      "concern_resolved__c", "dec_forms_sent_for_review__c"),
    boolsWhitelist = Seq(
      "isdeleted", "litify_pm__billable_matter__c",
      "litify_pm__ignore_default_plan__c",
      "litify_pm__limitations_date_satisfied__c",
      "litify_pm__matter_has_budget__c", "litify_pm__matter_team_modified__c",
      "litify_pm__manual_statute_of_limitations__c", "run_triggers__c",
      "litify_ext__isteammember__c", "litify_ext__private__c",
      "isdeceased__c", "serious_injury__c", "isminor__c", "conflict_check__c",
      "payment_overdue__c", "payments_criteria_2months__c", "is_synced__c",
      "urgent__c", "not_financial_user__c", "filling_fees_paid__c",
      "attorney_or_paralegal__c", "is_cl_specialist__c",
      "automatic_form_errors__c", "checkboxdate__c", "priority__c",
      "case_submitted__c", "pif__c", "foia_eoir__c",
      "filled_fee_is_filled_automation__c", "case_delivered__c",
      "attorney_approval__c", "consent_for_mts__c", "official_records__c",
      "early_aos_request__c", "mtt__c", "pro_bono__c",
      "marked_for_rfe_tagging__c", "ff_confirmed__c", "submission_qc__c",
      "removal__c", "original_docs_at_the_office__c", "i_765_filled__c",
      "cl_detained__c", "supervisor_call__c", "supervisor_call_resolved__c",
      "flagged_for_issues__c", "template_needed__c", "cases_sold_with__c",
      "money_back_guarantee__c", "archived__c", "unresponsive_client__c",
      "sensitive_case__c", "criminal_offense__c", "monitor_delivery__c",
      "post_dec_forms_review_edits__c", "attorney_call_needed__c",
      "case_monitoring__c", "open_warrant__c", "i_131__c",
      "claim_issue_found__c", "signature__c", "full_translation__c",
      "form_update__c"),
    ints = Seq(
      "live_saved__c", "lives_saved__c", "no_of_days__c",
      "turnaround_time__c", "count_role_records__c", "case_count__c",
      "live_associated__c", "litify_pm__matter__c",
      "litify_pm__total_calls__c", "successful_calls__c",
      "litify_pm__total_emails__c"),
    floats = Seq(
      "litify_pm__total_damages__c", "scheduled_amount__c",
      "litify_pm__total_hours__c", "litify_pm__total_amount_billable__c",
      "litify_pm__total_amount_due__c", "litify_pm__total_matter_value__c",
      "litify_pm__total_matter_cost__c", "litify_pm__total_amount_paid__c",
      "litify_pm__total_amount_billed__c",
      "litify_pm__total_amount_expensed_due__c",
      "litify_pm__total_amount_expensed__c",
      "litify_pm__total_amount_retained__c",
      "litify_pm__total_amount_unbilled_expenses__c",
      "litify_pm__total_amount_time_entries__c",
      "litify_pm__total_amount_time_entries_billed__c",
      "litify_pm__total_amount_time_entries_due__c",
      "litify_pm__total_amount_time_entries_unpaid__c",
      "litify_pm__lit_lien_total_currency__c",
      "litify_pm__lit_total_client_payout__c",
      "litify_pm__lit_damage_total__c", "litify_pm__lit_expense_total__c",
      "litify_pm__lit_lien_total__c", "total_billable_expenses__c",
      "total_unbilled_expenses__c", "total_billable_te__c",
      "total_unbilled_time_entries__c", "total_invoiced_amount__c",
      "total_payments_received__c", "total_expenses__c",
      "total_billed_expenses__c", "total_time_entries__c",
      "total_billed_time_entries__c", "total_payments_due__c",
      "total_uninvoiced_amount__c", "payment__c", "total_filing_fee__c",
      "total_overdue_amount__c", "urgentoverdue__c"),
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

  /** `legal.goals` (`lambda_legal_goals_upsert.py:48-59`): composite key,
    * conditional update when the goal value changed (M3). */
  val goals: TableSpec = TableSpec(
    name = "legal.goals",
    keys = Seq("employee_email", "week_first_day"),
    ordering = "week_first_day",
    strings = Seq("team", "employee", "employee_email"),
    datesDmy = Seq("week_first_day"),
    ints = Seq("week_number"),
    floats = Seq("goal")
  )

  /** `connect.f_calls` — 31 cols
    * (`SP_boto3_connect_redshift.sql:5-13`, row construction
    * `lambda_boto3_connect_redshift.py:120-182`). Tuple-insert pipeline:
    * no fillna — durations stay nullable longs. */
  val fCalls: TableSpec = TableSpec(
    name = "connect.f_calls",
    keys = Seq("contact_id"),
    ordering = "last_update_time",
    strings = Seq("contact_id", "init_contact_id", "prev_contact_id",
      "next_contact_id", "channel", "init_method", "disconn_reason",
      "agent_id", "agent_username", "queue_id", "queue_name",
      "customer_voice", "customer_phone", "sys_phone"),
    timestamps = Seq("init_time", "disconn_time", "last_update_time",
      "agent_conn", "agent_afw_start", "agent_afw_end", "in_queue_time",
      "out_queue_time", "conn_to_sys"),
    longs = Seq("agent_conn_att", "agent_afw_duration",
      "agent_interact_duration", "agent_holds", "agent_longest_hold",
      "queue_duration", "customer_hold_duration", "contact_duration")
  )

  /** `connect.dim_users` (`lambda_connect_user_upsert.py:116-140`). */
  val dimUsersConnect: TableSpec = TableSpec(
    name = "connect.dim_users",
    keys = Seq("user_id"),
    ordering = "last_modified",
    strings = Seq("user_id", "user_email", "user_name", "user_lastname"),
    timestamps = Seq("last_modified")
  )

  /** `connect.dim_queues` (`lambda_connect_queue_upsert.py:85-100`). */
  val dimQueues: TableSpec = TableSpec(
    name = "connect.dim_queues",
    keys = Seq("queue_id"),
    ordering = "last_modified",
    strings = Seq("queue_id", "queue_name"),
    timestamps = Seq("last_modified")
  )

  /** `connect.f_agent_metrics` — (agent, hour-interval) grain plus the 52
    * metric columns (`connect_agent_metrics.py:116-131`, metric list
    * `:139-158`); values rounded to 2 by the extractor, None -> NULL. */
  val agentMetrics: TableSpec = TableSpec(
    name = "connect.f_agent_metrics",
    keys = Seq("agent_id", "start_time"),
    ordering = "end_time",
    strings = Seq("agent_id"),
    timestamps = Seq("start_time", "end_time"),
    doubles = Seq(
      "sum_online_time_agent", "sum_non_productive_time_agent",
      "agent_adherent_time", "agent_non_adherent_time", "agent_answer_rate",
      "agent_non_response", "agent_non_response_without_customer_abandons",
      "agent_occupancy", "agent_scheduled_time", "agent_schedule_adherence",
      "avg_dials_per_minute", "sum_idle_time_agent",
      "sum_error_status_time_agent", "sum_contact_time_agent",
      "sum_connecting_time_agent", "sum_retry_callback_attempts",
      "percent_talk_time_customer", "avg_talk_time_customer",
      "percent_talk_time_agent", "avg_talk_time_agent", "percent_talk_time",
      "avg_talk_time", "contacts_queued", "contacts_queued_by_enqueue",
      "max_queued_time", "contacts_transferred_out_from_queue",
      "avg_queue_answer_time", "contacts_created",
      "sum_contacts_disconnected", "avg_active_time", "abandonment_rate",
      "avg_non_talk_time", "avg_interruption_time_agent", "delivery_attempts",
      "contacts_transferred_out", "contacts_transferred_out_internal",
      "contacts_transferred_out_external", "contacts_put_on_hold",
      "avg_holds", "sum_hold_time", "contacts_hold_abandons",
      "contacts_on_hold_agent_disconnect",
      "contacts_on_hold_customer_disconnect", "contacts_handled",
      "avg_handle_time", "sum_handle_time", "avg_interaction_time",
      "sum_interaction_time", "avg_contact_duration",
      "sum_interaction_and_hold_time", "avg_after_contact_work_time",
      "sum_after_contact_work_time")
  )
}
