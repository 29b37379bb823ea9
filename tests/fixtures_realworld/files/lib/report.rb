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

    private

    def open_tasks
      @tasks.reject { |t| t[:done] }
    end
  end
end

def quick_report(path)
  Reporting::Summary.from_file(path).render
end
