from data_engineering_pipeline_spark.plans.pipeline import Pipeline, stage

__all__ = ["Pipeline", "stage"]
