package graft.etl

import org.apache.spark.sql.types._

/** The reference's loan input contract
  * (/root/reference/airflow/include/loan_spark_etl.py:4-6, README.md:197-199).
  *
  * The reference infers schema per run (`inferSchema=True`,
  * loan_spark_etl.py:155) and guards every access on column existence — the
  * canonical StructType here is for the validated/streaming path, where
  * inference is either unavailable (readStream) or undesirable (a second full
  * scan of 100 TB just to guess types).
  */
object LoanSchema {

  val columns: Seq[String] = Seq(
    "loan_id", "customer_id", "created_at", "amount", "interest_rate",
    "tenure_months", "status", "product_type", "branch", "credit_score_band")

  val canonical: StructType = StructType(Seq(
    StructField("loan_id", StringType),
    StructField("customer_id", StringType),
    StructField("created_at", StringType),
    StructField("amount", DoubleType),
    StructField("interest_rate", DoubleType),
    StructField("tenure_months", LongType),
    StructField("status", StringType),
    StructField("product_type", StringType),
    StructField("branch", StringType),
    StructField("credit_score_band", StringType)))

  val groupColumns: Seq[String] = Seq("status", "product_type", "branch")
}
