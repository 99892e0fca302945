package graft.sql

/** The registered `CREATE DICTIONARY` set — the analog of the ClickHouse
  * server's dictionary objects (reference context: the server the
  * reference's create_db.py DDL runs on resolves `dictGet` against
  * DDL-declared dictionaries; the engine semantics live in
  * [[graft.operators.Dictionaries]], this is the TEXT declaration layer).
  *
  * Process-global like [[GraftSql.queryCache]]: CH dictionaries are
  * server objects, not per-session state. [[ChDdl]] registers
  * declarations (and binds the probe temp view), [[ChDialect]] consults
  * them to lower `dictGet('d','attr',k)` onto a correlated
  * scalar-subquery probe of the view.
  */
object DictRegistry {

  /** One declared dictionary.
    *
    * @param name  dictionary name as declared
    * @param view  the bound probe temp view (`__dict_<name>`) holding the
    *              declared columns of the source table
    * @param keys  PRIMARY KEY columns (1 for FLAT/HASHED, 1+ for
    *              COMPLEX_KEY_HASHED)
    * @param attrs attribute -> miss-default as SQL literal text (the
    *              declared `DEFAULT`, else the CH type default — dictGet
    *              never returns null on a miss)
    * @param layout declared LAYOUT kind (normalized upper-case)
    */
  final case class DictDef(name: String, view: String, keys: Seq[String],
                           attrs: Seq[(String, String)], layout: String) {
    def defaultOf(attr: String): Option[String] =
      attrs.collectFirst { case (a, d) if a == attr => d }
  }

  private val dicts =
    scala.collection.concurrent.TrieMap.empty[String, DictDef]

  def put(d: DictDef): Unit = dicts.put(d.name, d)
  def get(name: String): Option[DictDef] = dicts.get(name)
  def remove(name: String): Boolean = dicts.remove(name).isDefined
  def list: Seq[DictDef] = dicts.values.toSeq.sortBy(_.name)
}
