package graft.queries

/** Single place each new query family gets registered. Order matters only
  * for readability of driver artifacts; names must be unique. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
