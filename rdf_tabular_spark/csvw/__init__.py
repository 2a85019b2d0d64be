"""Driver-side CSVW compilation: metadata model, datatypes, UAX-35 pattern
compilers, URI-template compiler. Nothing in this package touches executors;
everything compiles down to Spark column expressions used by
:mod:`rdf_tabular_spark.operators`."""
