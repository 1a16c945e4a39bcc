package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed Microsoft 365 unified-audit mapping (reference
  * data/managed/log_sources/o365/tables/audit.yml): JSON audit records →
  * ECS. Covers the RecordType → schema-name table (event.code), outcome
  * from ResultStatus/UserType, severity levels, client-ip precedence
  * (ClientIPAddress > ClientIP > ActorIpAddress), Parameters/
  * ExtendedProperties name-value maps, AzureActiveDirectory user-CRUD
  * action normalization, StsLogon authentication typing, SharePoint file
  * operation file/category/type derivation, and SecurityComplianceAlerts
  * rule mapping. Tenant-config injection and the long tail of per-workload
  * specializations (Teams, PowerBI, DLP detail) are out of this subset.
  */
object O365Audit {

  /** RecordType id → audit schema name (Office 365 Management API). */
  val recordTypeSchema: Map[Int, String] = Map(
    1 -> "ExchangeAdmin", 2 -> "ExchangeItem", 3 -> "ExchangeItemGroup",
    4 -> "SharePoint", 6 -> "SharePointFileOperation", 7 -> "OneDrive",
    8 -> "AzureActiveDirectory", 9 -> "AzureActiveDirectoryAccountLogon",
    10 -> "DataCenterSecurityCmdlet", 11 -> "ComplianceDLPSharePoint",
    12 -> "Sway", 13 -> "ComplianceDLPExchange", 14 -> "SharePointSharingOperation",
    15 -> "AzureActiveDirectoryStsLogon", 16 -> "SkypeForBusinessPSTNUsage",
    17 -> "SkypeForBusinessUsersBlocked", 18 -> "SecurityComplianceCenterEOPCmdlet",
    19 -> "ExchangeAggregatedOperation", 20 -> "PowerBIAudit", 21 -> "CRM",
    22 -> "Yammer", 23 -> "SkypeForBusinessCmdlets", 24 -> "Discovery",
    25 -> "MicrosoftTeams", 28 -> "ThreatIntelligence", 29 -> "MailSubmission",
    30 -> "MicrosoftFlow", 31 -> "AeD", 32 -> "MicrosoftStream",
    33 -> "ComplianceDLPSharePointClassification", 34 -> "ThreatFinder",
    35 -> "Project", 36 -> "SharePointListOperation", 37 -> "SharePointCommentOperation",
    38 -> "DataGovernance", 39 -> "Kaizala", 40 -> "SecurityComplianceAlerts",
    41 -> "ThreatIntelligenceUrl", 42 -> "SecurityComplianceInsights", 43 -> "MIPLabel",
    44 -> "WorkplaceAnalytics", 45 -> "PowerAppsApp", 46 -> "PowerAppsPlan",
    47 -> "ThreatIntelligenceAtpContent", 48 -> "LabelContentExplorer",
    49 -> "TeamsHealthcare", 50 -> "ExchangeItemAggregated", 51 -> "HygieneEvent",
    52 -> "DataInsightsRestApiAudit", 53 -> "InformationBarrierPolicyApplication",
    54 -> "SharePointListItemOperation", 55 -> "SharePointContentTypeOperation",
    56 -> "SharePointFieldOperation", 57 -> "MicrosoftTeamsAdmin", 58 -> "HRSignal",
    59 -> "MicrosoftTeamsDevice", 60 -> "MicrosoftTeamsAnalytics",
    61 -> "InformationWorkerProtection", 62 -> "Campaign", 63 -> "DLPEndpoint",
    64 -> "AirInvestigation", 65 -> "Quarantine", 66 -> "MicrosoftForms",
    67 -> "ApplicationAudit", 68 -> "ComplianceSupervisionExchange",
    69 -> "CustomerKeyServiceEncryption", 70 -> "OfficeNative",
    71 -> "MipAutoLabelSharePointItem", 72 -> "MipAutoLabelSharePointPolicyLocation",
    73 -> "MicrosoftTeamsShifts", 75 -> "MipAutoLabelExchangeItem",
    76 -> "CortanaBriefing", 78 -> "WDATPAlerts", 82 -> "SensitivityLabelPolicyMatch",
    83 -> "SensitivityLabelAction", 84 -> "SensitivityLabeledFileAction",
    85 -> "AttackSim", 86 -> "AirManualInvestigation", 87 -> "SecurityComplianceRBAC",
    88 -> "UserTraining", 89 -> "AirAdminActionInvestigation", 90 -> "MSTIC",
    91 -> "PhysicalBadgingSignal", 93 -> "AipDiscover", 94 -> "AipSensitivityLabelAction",
    95 -> "AipProtectionAction", 96 -> "AipFileDeleted", 97 -> "AipHeartBeat",
    98 -> "MCASAlerts", 99 -> "OnPremisesFileShareScannerDlp",
    100 -> "OnPremisesSharePointScannerDlp", 101 -> "ExchangeSearch",
    102 -> "SharePointSearch", 103 -> "PrivacyInsights", 105 -> "MyAnalyticsSettings",
    106 -> "SecurityComplianceUserChange", 107 -> "ComplianceDLPExchangeClassification",
    109 -> "MipExactDataMatch", 113 -> "MS365DCustomDetection",
    147 -> "CoreReportingSettings", 148 -> "ComplianceConnector",
    174 -> "DataShareOperation", 181 -> "EduDataLakeDownloadOperation")

  private val nameValue = ArrayType(StructType(Seq(
    StructField("Name", StringType), StructField("Value", StringType))))

  val rawSchema: StructType = StructType(Seq(
    StructField("CreationTime", StringType),
    StructField("Id", StringType),
    StructField("Operation", StringType),
    StructField("OrganizationId", StringType),
    StructField("OrganizationName", StringType),
    StructField("RecordType", IntegerType),
    StructField("ResultStatus", StringType),
    StructField("UserId", StringType),
    StructField("UserType", IntegerType),
    StructField("UserAgent", StringType),
    StructField("Workload", StringType),
    StructField("ObjectId", StringType),
    StructField("ClientIPAddress", StringType),
    StructField("ClientIP", StringType),
    StructField("ActorIpAddress", StringType),
    StructField("MailboxOwnerUPN", StringType),
    StructField("LogonUserSid", StringType),
    StructField("LogonUserDisplayName", StringType),
    StructField("ClientProcessName", StringType),
    StructField("SourceRelativeUrl", StringType),
    StructField("SourceFileName", StringType),
    StructField("SourceFileExtension", StringType),
    StructField("Parameters", nameValue),
    StructField("ExtendedProperties", nameValue),
    StructField("Severity", StringType),
    StructField("Comments", StringType),
    StructField("Name", StringType),
    StructField("PolicyId", StringType),
    StructField("Category", StringType),
    StructField("EntityType", StringType),
    StructField("AlertEntityId", StringType),
    StructField("AlertLinks", ArrayType(StructType(Seq(
      StructField("AlertLinkHref", StringType)))))))

  private val fileActions = Seq(
    "FileAccessed", "FileDeleted", "FileDownloaded", "FileModified", "FileMoved",
    "FileRenamed", "FileRestored", "FileUploaded", "FolderCopied", "FolderCreated",
    "FolderDeleted", "FolderModified", "FolderMoved", "FolderRenamed", "FolderRestored")

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.kind", lit("event"))
    // the Z-split tolerates CreationTime values missing the zone suffix
    set("ts", try_to_timestamp(
      concat(try_element_at(split(col("r.CreationTime"), "Z"), lit(1)), lit("Z"))))
    set("event.id", col("r.Id"))
    set("user.id", col("r.UserId"))
    set("event.provider", col("r.Workload"))
    set("organization.id", col("r.OrganizationId"))
    set("user_agent.original", col("r.UserAgent"))

    // RecordType → schema name
    val code = recordTypeSchema.foldLeft(lit(null).cast(StringType)) {
      case (acc, (k, v)) => when(col("r.RecordType") === k, lit(v)).otherwise(acc)
    }
    set("event.code", code)

    val rs = lower(col("r.ResultStatus"))
    set("event.outcome", coalesce(
      when(rs.isin("succeeded", "success", "partiallysucceeded", "true"), "success")
        .when(rs.isin("failed", "false"), "failure"),
      lit("success")))

    def nvMap(c: Column) = map_from_entries(
      F.transform(filter(c, e => e.getField("Value").isNotNull),
        e => struct(e.getField("Name").as("key"), e.getField("Value").as("value"))))
    set("o365.audit", struct(
      col("r.RecordType").as("record_type"),
      col("r.UserType").as("user_type"),
      col("r.ObjectId").as("object_id"),
      when(col("r.Parameters").isNotNull, nvMap(col("r.Parameters"))).as("parameters"),
      when(col("r.ExtendedProperties").isNotNull,
        nvMap(col("r.ExtendedProperties"))).as("extended_properties"),
      F.transform(coalesce(col("r.AlertLinks"),
        array().cast(rawSchema("AlertLinks").dataType.asInstanceOf[ArrayType])),
        v => v.getField("AlertLinkHref")).as("alert_links")))

    set("event.severity",
      when(col("r.Severity") === "informational", 1L)
        .when(col("r.Severity") === "low", 2L)
        .when(col("r.Severity") === "medium", 3L)
        .when(col("r.Severity") === "high", 4L))

    val clientIp = coalesce(
      col("r.ClientIPAddress"), col("r.ClientIP"), col("r.ActorIpAddress"))
    set("source.ip", clientIp)
    set("related.ip", filter(array(clientIp), x => x.isNotNull))
    set("related.user", filter(array(col("r.UserId")), x => x.isNotNull))
    set("user.email", when(col("r.UserId").contains("@"), col("r.UserId")))

    // AzureActiveDirectory user CRUD normalization
    val isAad = code === "AzureActiveDirectory"
    val op = col("r.Operation")
    set("event.action",
      when(isAad && op === "Add user.", "added-user-account")
        .when(isAad && op === "Update user.", "modified-user-account")
        .when(isAad && op === "Delete user.", "deleted-user-account")
        .otherwise(op))
    set("user.target.id", when(isAad, col("r.ObjectId")))

    val isSts = code === "AzureActiveDirectoryStsLogon"
    val isSpFile = code.isin("SharePointFileOperation", "SharePointSharingOperation")
    set("url.original", when(isSpFile, col("r.ObjectId")))
    set("file.directory", when(isSpFile, col("r.SourceRelativeUrl")))
    set("file.name", when(isSpFile, col("r.SourceFileName")))
    set("file.extension", when(isSpFile, col("r.SourceFileExtension")))

    // ExchangeItem identity
    val isExItem = code === "ExchangeItem"
    set("user.email", coalesce(when(isExItem, col("r.MailboxOwnerUPN")), g("user.email")))
    set("user.full_name", when(isExItem, col("r.LogonUserDisplayName")))
    set("process.name", when(isExItem, col("r.ClientProcessName")))
    set("organization.name",
      when(code.isin("ExchangeAdmin", "ExchangeItem"), col("r.OrganizationName")))

    // SecurityComplianceAlerts → rule + alert kind
    val isAlert = code === "SecurityComplianceAlerts"
    set("event.kind", when(isAlert, "alert").otherwise("event"))
    set("message", when(isAlert, col("r.Comments")))
    set("rule.name", when(isAlert, col("r.Name")))
    set("rule.id", when(isAlert, col("r.PolicyId")))
    set("rule.category", when(isAlert, col("r.Category")))
    set("rule.ruleset", when(isAlert, col("r.EntityType")))
    set("rule.reference", when(isAlert, array_join(g("o365.audit.alert_links"), ", ")))

    val empty = array().cast(ArrayType(StringType))
    def tag(cond: Column, v: String) = when(cond, array(lit(v))).otherwise(empty)
    set("event.category", concat(
      array(lit("web")),
      tag(isAad && op.isin("Add user.", "Update user.", "Delete user."), "iam"),
      tag(isSts, "authentication"),
      tag(op.isin(fileActions: _*), "file"),
      tag(op === "ComplianceSettingChanged", "configuration"),
      tag(isAlert && col("r.Category") === "AccessGovernance", "authentication"),
      tag(isAlert && col("r.Category").isin("DataGovernance", "DataLossPrevention"), "file"),
      tag(isAlert && col("r.Category") === "ThreatManagement", "malware")))
    set("event.type", concat(
      array(lit("info")),
      tag(isAad && op === "Add user.", "user"), tag(isAad && op === "Add user.", "creation"),
      tag(isAad && op === "Update user.", "user"), tag(isAad && op === "Update user.", "change"),
      tag(isAad && op === "Delete user.", "user"), tag(isAad && op === "Delete user.", "deletion"),
      tag(isSts, "start"), tag(isSts, "access"),
      tag(op.isin("FileAccessed", "FileDownloaded"), "access"),
      tag(op.isin("ComplianceSettingChanged", "FileModified", "FileMoved", "FileRenamed",
        "FileRestored", "FolderModified", "FolderMoved", "FolderRenamed", "FolderRestored"),
        "change"),
      tag(op.isin("FileDeleted", "FolderDeleted"), "deletion"),
      tag(op.isin("FileUploaded", "FolderCopied", "FolderCreated"), "creation")))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
