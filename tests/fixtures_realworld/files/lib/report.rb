require 'json'
require_relative 'tracker/store'

module Reporting
  class Summary
    def initialize(tasks)
      @tasks = tasks
    end

    def render
      open_tasks.map { |t| "- #{t[:title]}" }.join("\n")
    end

    def self.from_file(path)
      new(JSON.parse(File.read(path), symbolize_names: true))
    end

    # wave-8 shape: heredoc body is string DATA — count(*) and the
    # decl-shaped line never become mentions
    def overdue_sql
      <<~SQL
        SELECT count(*) FROM tasks
        def ghost; end
        WHERE done = 0
      SQL
    end

    private

    def open_tasks
      @tasks.reject { |t| t[:done] }
    end
  end
end

def quick_report(path)
  Reporting::Summary.from_file(path).render
end
