package graft.queries

/** All declared engine queries — the coverage surface the driver verifies
  * (SURVEY.md §2). Names must be unique; enforced at object init.
  */
object Registry {
  val all: Seq[Q] =
    CalTopoQueries.all ++ RelationalQueries.all ++ EventQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ MultimodalQueries.all ++
      ExtraQueries.all ++ SqlQueries.all ++ StatQueries.all

  require(all.map(_.name).distinct.size == all.size,
    s"duplicate query names: ${all.map(_.name).diff(all.map(_.name).distinct)}")
}
