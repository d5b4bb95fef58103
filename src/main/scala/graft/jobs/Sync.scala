package graft.jobs

/** Stage-selection layer — the `build_sync(selected_modules)` analog
  * (cartography/sync.py:210-243): a sync is an ordered registry of named
  * stages, and a user-supplied comma-separated subset selects which ones
  * run. Unknown names fail fast with the full list of valid values,
  * mirroring parse_and_validate_selected_modules.
  */
object Sync {

  /** Parse + validate a comma-separated stage selection against the
    * registry. Preserves user order (the reference runs stages in the
    * order given); blank entries are rejected like any unknown name.
    */
  def parseAndValidateSelectedModules(selected: String,
                                      registry: Seq[String]): Seq[String] = {
    // -1 keeps trailing empty segments: "extract," must be rejected like
    // ",extract" (a trailing comma usually means a truncated selection)
    val names = selected.split(",", -1).map(_.trim).toSeq
    names.foreach { m =>
      if (!registry.contains(m))
        throw new IllegalArgumentException(
          s"""Error parsing `selected_modules`. You specified "$selected". """ +
            "Please check that your string is formatted properly. " +
            s"""Example valid input looks like "${registry.take(2).mkString(",")}". """ +
            s"Our full list of valid values is: ${registry.mkString(", ")}.")
    }
    names
  }
}
