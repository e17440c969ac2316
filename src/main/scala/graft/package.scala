import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Session-free `$"col"` interpolator (spark.implicits requires a live
  * session; library code shouldn't). Files that import
  * spark.implicits._ must not also rely on this one.
  */
package object graft {
  implicit final class ColStringContext(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
