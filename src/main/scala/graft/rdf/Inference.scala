package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS forward-chaining entailment over the quad relation's triple
  * projection — the inference twin of shape validation (the reference
  * loads its vocabularies as SKOS/RDFS graphs, `Taskfile.yml:50`,
  * `cam/etl/namespaces.py`; a SPARQL store over them answers queries
  * under RDFS semantics).
  *
  * Scale split is the whole design: the T-box (class/property hierarchy)
  * is small BY NATURE — its transitive closure costs nothing and the
  * closed relation broadcasts; the A-box (instance triples, the 100 TB
  * side) is touched by exactly two broadcast hash joins, one per rule, so
  * entailment adds no shuffle beyond the final set-semantics `distinct`.
  * Rules implemented (the materializing core of RDFS):
  *   - rdfs7: `p ⊑ q  ∧  (s p o)  ⊢  (s q o)`   (subPropertyOf)
  *   - rdfs9: `C ⊑ D  ∧  (x type C)  ⊢  (x type D)` (subClassOf)
  *   - rdfs11/rdfs5 (transitivity of ⊑) via [[PropertyPath.closure]] on
  *     the T-box edges.
  */
object Inference {

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Reflexive-free transitive closure of a `(sub, sup)` hierarchy
    * (rdfs5/rdfs11). T-box-sized input; result is broadcast by
    * [[entail]]. */
  def hierarchyClosure(edges: DataFrame): DataFrame =
    PropertyPath.closure(
      edges.select(col("sub").as("src"), col("sup").as("dst")))
      .select(col("src").as("sub"), col("dst").as("sup"))

  /** Entailed triple set (distinct) of `triples` under the CLOSED
    * `subProp` / `subClass` hierarchies — close them with
    * [[hierarchyClosure]] first.
    *
    * @param triples  `(subject, predicate, objectValue)`
    * @param subProp  closed subPropertyOf pairs `(sub, sup)`
    * @param subClass closed subClassOf pairs `(sub, sup)`
    */
  def entail(triples: DataFrame, subProp: DataFrame,
      subClass: DataFrame): DataFrame = {
    val t = triples.select(col("subject"), col("predicate"),
      col("objectValue"))
    // rdfs7: rewrite each asserted predicate to all its super-properties
    val viaProp = t
      .join(broadcast(subProp), t("predicate") === subProp("sub"))
      .select(col("subject"), col("sup").as("predicate"),
        col("objectValue"))
    val withProps = t.unionByName(viaProp)
    // rdfs9: lift every (possibly just-inferred) type to its superclasses
    val types = withProps.filter(col("predicate") === RdfType)
    val viaClass = types
      .join(broadcast(subClass), types("objectValue") === subClass("sub"))
      .select(col("subject"), lit(RdfType).as("predicate"),
        col("sup").as("objectValue"))
    withProps.unionByName(viaClass).distinct()
  }
}
