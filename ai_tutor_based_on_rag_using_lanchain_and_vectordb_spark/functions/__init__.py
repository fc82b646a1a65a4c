"""Column-expression library. Everything here returns pyspark Column
expressions built from pyspark.sql.functions — JVM-side, codegen-friendly,
no Python UDFs — so they inline into WholeStageCodegen spans.
"""
