package org.apache.spark.sql.delta.catalog

/** TEST-ONLY marker bearing the exact class name
  * [[graft.model.TableFormat.Delta]]'s availability probe resolves via
  * `Class.forName` — its presence on the TEST classpath makes the probe
  * report "delta available", so the ModelSpec delta branches exercise
  * the real dispatch path (DDL + MERGE routed to
  * [[graft.testdelta.DeltaishCatalog]]) instead of canceling.
  *
  * It is never instantiated and implements nothing: on a real cluster
  * this name is Delta's catalog plugin; here it only answers the
  * question "are delta classes on the classpath" in the affirmative for
  * tests. Production code never links against it (test scope only).
  * The fail-fast require path stays covered via the
  * `graft.format.disable` kill-switch (ModelSpec).
  */
class DeltaCatalog private ()

/** Static tag distinguishing this marker from Delta's real plugin class
  * (r16, advisory): if real delta-spark jars ever land on the test
  * classpath, the duplicate FQCN would make probe results depend on
  * classpath order and could silently shadow the marker. ModelSpec
  * asserts the loaded class exposes this tag, so an accidental real
  * Delta dependency fails LOUDLY instead of masking availability. */
object DeltaCatalog {
  val GraftTestMarker: Boolean = true
}
