from apde_etl_spark.plans.qa_pipeline import QaConfig, QaResults, run_qa_pipeline

__all__ = ["QaConfig", "QaResults", "run_qa_pipeline"]
