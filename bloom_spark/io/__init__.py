from bloom_spark.io.blf import (  # noqa: F401
    blf_membership_udf,
    read_blf,
    read_header,
    reference_xxh_table,
    write_blf,
)
from bloom_spark.io.blf_bloom import ReferenceBloom  # noqa: F401
from bloom_spark.io.pages import synthesize_pages  # noqa: F401
