package graft.config

/** C6 — resolve each configured table name to exactly one enumerated
  * catalog/source table (the kenzo0107 patch's matching rule: a catalog
  * name matches when it ends with `<database>_<tableName>` or equals the
  * prefixed name; ≠1 match is a configuration error,
  * jdbc_incremental.py:520-539).
  */
object TableResolution {

  /** @param available catalog table names already filtered to the source
    *                  prefix (S5, `jdbc_incremental.py:505-518`)
    * @param database  logical source database (the `'<database>'`
    *                  placeholder the reference makes users substitute)
    */
  def resolve(
      available: Seq[String], database: String, tables: Seq[TableConfig]): Map[String, String] =
    tables.map { t =>
      val suffix = s"${database}_${t.tableName}"
      val matches = available.filter(n => n.endsWith(suffix) || n == t.tableName)
      if (matches.size != 1)
        throw new ConfigError(
          s"table '${t.tableName}' resolves to ${matches.size} catalog tables " +
            s"(${matches.mkString(", ")}); expected exactly 1")
      t.tableName -> matches.head
    }.toMap
}
